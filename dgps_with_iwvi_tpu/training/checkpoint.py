"""Checkpoint / deterministic resume via orbax.

TPU-native rebuild of the reference's gpflow monitor.CheckpointTask +
tf.train.Saver cadence (SURVEY.md §5): saves the FULL resumable state —
train state (params split + Adam moments + natgrad (m, S) blocks), the PRNG
key, and the step counter — so a restarted run continues bit-for-bit.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _globalize(payload):
    """Multi-process: orbax serializes GLOBAL arrays only. Host-local leaves
    (e.g. the PRNG key, or host scalars) are converted to fully-replicated
    global arrays over all devices; already-global (not-fully-addressable)
    leaves pass through. No-op single-process."""
    if jax.process_count() == 1:
        return payload
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    mesh = Mesh(np.asarray(jax.devices()), ("_all",))
    s = NamedSharding(mesh, PartitionSpec())

    def fix(a):
        if isinstance(a, jax.Array) and a.is_fully_addressable:
            h = np.asarray(a)
            return jax.make_array_from_callback(h.shape, s,
                                                lambda idx: h[idx])
        return a

    return jax.tree.map(fix, payload)


def save_checkpoint(ckpt_dir: str, step: int, state, key: jax.Array) -> str:
    """Orbax-backed save; falls back to npz-of-leaves if orbax is unhappy
    (keeps checkpointing working in minimal environments). Multi-process:
    collective — every process must call it; no npz fallback (a per-process
    npz would silently shear the global checkpoint)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = _globalize({"state": state, "key": key})
    multiprocess = jax.process_count() > 1
    try:
        import orbax.checkpoint as ocp

        path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()
        return path
    except Exception as e:
        if multiprocess:
            raise  # collective save must not shear into per-process npz files
        # Loud: a real orbax failure (permissions, half-written dir) must not
        # silently degrade to the npz path — restore would then take the
        # orbax branch and fail confusingly.
        import warnings

        warnings.warn(
            f"orbax save failed ({type(e).__name__}: {e}); falling back to "
            f"npz-of-leaves in {ckpt_dir} — restore will use the npz path "
            "only if the orbax directory is absent", stacklevel=2)
        path = os.path.join(ckpt_dir, f"step_{step}.npz")
        leaves, treedef = jax.tree.flatten(payload)
        np.savez(path, *[np.asarray(l) for l in leaves],
                 treedef=str(treedef))
        return path


def latest_step(ckpt_dir: str) -> int | None:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for d in os.listdir(ckpt_dir):
        name = d.removesuffix(".npz")
        if name.startswith("step_"):
            try:
                steps.append(int(name.split("_")[1]))
            except ValueError:
                pass
    return max(steps) if steps else None


def restore_checkpoint(ckpt_dir: str, step: int, like: Any):
    """Restore {'state': ..., 'key': ...} given a pytree template `like`
    of the same structure (build it via make_trainer(...)[0](params))."""
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    if os.path.exists(path):
        import orbax.checkpoint as ocp

        like = _globalize(like)  # multi-process: template must be global too
        ckptr = ocp.StandardCheckpointer()
        try:
            return ckptr.restore(path, like)
        except (ValueError, TypeError, KeyError) as e:
            # Tree-structure/shape mismatches are the layout-drift signature
            # (the natgrad state layout evolved across versions, e.g. the
            # carried q_logdet entry). Other exception types (IO, permission,
            # corruption) propagate untouched so they aren't misdiagnosed.
            raise type(e)(
                f"{e}\n[restore_checkpoint] hint: a structure/shape mismatch "
                f"restoring {path} usually means the checkpoint was written "
                "by a build with a different TrainState layout (or different "
                "--natgrad/--q_diag flags). Rebuild with the original flags, "
                "or retrain without --resume.").with_traceback(
                    e.__traceback__) from None
    npz = path + ".npz"
    data = np.load(npz, allow_pickle=False)
    leaves = [data[k] for k in data.files if k != "treedef"]
    _, treedef = jax.tree.flatten(like)
    return jax.tree.unflatten(treedef, leaves)
