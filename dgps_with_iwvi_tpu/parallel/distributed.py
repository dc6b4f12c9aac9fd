"""Multi-host (multi-process) entry points.

The reference is strictly single-process (SURVEY.md §2.0); multi-host
support is scoped per SURVEY.md §5 to DCN for INPUT + CHECKPOINTS only —
the model math never communicates over DCN (params replicated, gradient
psum rides ICI inside each slice's mesh).

Single-controller vs multi-controller: everything in this package works
unchanged in a single process (the virtual-device test mesh included).
For a real multi-host TPU slice, call :func:`initialize` first in EVERY
process, then build the mesh over ``jax.devices()`` (global) as usual;
``sharding.shard_arrays`` / ``sharding.replicate`` assemble global arrays
from per-process data via ``jax.make_array_from_*`` instead of
``device_put`` (which would require all addressable devices).

Launch recipe (GCE TPU pod slice, one process per host):

    # on every worker, same command:
    python -c "
    from dgps_with_iwvi_tpu.parallel import distributed, make_mesh, ...
    distributed.initialize()          # TPU auto-detect, or pass explicit
    mesh = make_mesh()                # over ALL chips in the slice
    Xl, Yl = <this process's row chunk>   # equal-size chunks, process_id order
    Xs, Ys = shard_arrays(mesh, Xl, Yl)
    state = replicate(mesh, init_fn(params))
    ...
    "

Checkpoints: orbax StandardCheckpointer handles mesh-sharded arrays; all
processes must call save/restore collectively (training/checkpoint.py is
already orbax-backed; see tests/test_parallel.py sharded-restore test).
"""

from __future__ import annotations

import os

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """jax.distributed.initialize wrapper; returns True if multi-process.

    With no arguments: initializes from the environment when a multi-process
    launch is detectable (explicit JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID, or a TPU pod environment where
    jax.distributed auto-detects), and is a safe no-op for single-process
    runs (the common case, and every test environment here).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    explicit = coordinator_address is not None and num_processes is not None
    # TPU pod auto-detect: multiple worker hostnames (a single-host TPU VM —
    # and this container's tunneled chip — sets TPU_WORKER_HOSTNAMES too)
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    tpu_pod = "," in hosts
    if (coordinator_address is not None and num_processes is None
            and not tpu_pod):
        # a coordinator with no world size cannot be a single-process run —
        # silently proceeding would have every host train its own model.
        # (On a TPU pod, jax.distributed.initialize auto-detects
        # num_processes/process_id from the TPU environment, so the explicit
        # values are optional there.)
        raise ValueError(
            "initialize(coordinator_address=...) also needs num_processes "
            "(and process_id) outside a TPU pod environment — set them "
            "explicitly or export JAX_NUM_PROCESSES / JAX_PROCESS_ID on "
            "every host")
    if not (explicit or tpu_pod):
        return False  # single-process: nothing to do
    from jax._src import xla_bridge

    if xla_bridge.backends_are_initialized():
        raise RuntimeError(
            "distributed.initialize() must run before ANY jax call "
            "(jax.devices, device_put, ...) in every process — move it to "
            "the top of your launch script")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    return jax.process_count() > 1


def is_multiprocess() -> bool:
    return jax.process_count() > 1
