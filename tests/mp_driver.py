"""Multi-process CPU driver, launched by tests/test_multiprocess.py.

Runs the REAL multi-controller path (VERDICT r2 item 2): every process
calls jax.distributed.initialize against a localhost coordinator, builds
the global ('dp','k') mesh over all 8 devices (4 local per process x 2
processes, or 8 local single-process for the reference run), assembles
global arrays from per-process row chunks via shard_arrays
(jax.make_array_from_process_local_data), replicates the train state,
runs sharded natgrad+Adam chunks, and does a COLLECTIVE orbax
save/restore. Prints one JSON line the parent test compares across
processes and against the single-process reference.

Usage: python mp_driver.py <process_id> <num_processes> <port> <ckpt_dir>
"""

import json
import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
ckdir = sys.argv[4]
ndev_local = 8 // nproc
os.environ["XLA_FLAGS"] = \
    f"--xla_force_host_platform_device_count={ndev_local}"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# must run BEFORE any backend-initializing jax call (the package import is
# backend-pure — enforced by test_multiprocess.py::test_import_is_backend_pure)
from dgps_with_iwvi_tpu.parallel import distributed  # noqa: E402

multi = (distributed.initialize(coordinator_address=f"localhost:{port}",
                                num_processes=nproc, process_id=pid)
         if nproc > 1 else False)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from dgps_with_iwvi_tpu.models import BuildArgs, build_model  # noqa: E402
from dgps_with_iwvi_tpu.parallel.sharding import (  # noqa: E402
    make_parallel_trainer, replicate, shard_arrays)
from dgps_with_iwvi_tpu.training import TrainConfig  # noqa: E402
from dgps_with_iwvi_tpu.training.checkpoint import (  # noqa: E402
    restore_checkpoint, save_checkpoint)

assert len(jax.devices()) == 8, jax.devices()
assert jax.process_count() == nproc


def host(x):
    """Host value of a replicated global array (multi-process safe)."""
    return np.asarray(x.addressable_data(0))


# identical deterministic data in every process; each process feeds only
# its contiguous row chunk (process_id order) to shard_arrays
rng = np.random.RandomState(0)
N, D = 64, 3
X = rng.randn(N, D).astype(np.float32)
Y = np.sin(X[:, :1]).astype(np.float32) + 0.1 * rng.randn(N, 1).astype(
    np.float32)

key = jax.random.PRNGKey(0)
build = BuildArgs(configuration="LG", mode="IW", num_inducing=8,
                  num_iw_samples=4)
cfg, params = build_model(key, build, jnp.asarray(X), jnp.asarray(Y))

mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("dp", "k"))
tc = TrainConfig(lr=1e-2, gamma=1e-2, natgrad="final", minibatch_size=32,
                 iterations=10, steps_per_call=5)
init_fn, _, chunk_fn, params_fn = make_parallel_trainer(cfg, tc, mesh)

if multi:
    lo, hi = pid * N // nproc, (pid + 1) * N // nproc
    Xs, Ys = shard_arrays(mesh, X[lo:hi], Y[lo:hi])
else:
    Xs, Ys = shard_arrays(mesh, X, Y)

state = replicate(mesh, init_fn(params))
chunk = jax.jit(chunk_fn)
state, losses1 = chunk(state, Xs, Ys, jax.random.fold_in(key, 0))
losses1 = host(losses1)

# collective orbax save (all processes participate)
save_checkpoint(ckdir, int(host(state.step)), state, key)
pre_leaf = host(jax.tree.leaves(state.rest)[0])

# restore against a replicated template and verify bit-exact
template = {"state": replicate(mesh, init_fn(params)), "key": key}
restored = restore_checkpoint(ckdir, 5, template)["state"]
np.testing.assert_array_equal(host(jax.tree.leaves(restored.rest)[0]),
                              pre_leaf)

# continue training from the restored state
state2, losses2 = chunk(restored, Xs, Ys, jax.random.fold_in(key, 1))
losses2 = host(losses2)

print("RESULT " + json.dumps({
    "pid": pid, "multi": bool(multi),
    "losses1": [float(v) for v in losses1],
    "losses2": [float(v) for v in losses2],
    "final_step": int(host(state2.step)),
}), flush=True)
