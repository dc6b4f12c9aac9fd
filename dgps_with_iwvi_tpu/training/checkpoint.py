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


def save_checkpoint(ckpt_dir: str, step: int, state, key: jax.Array) -> str:
    """Orbax-backed save; falls back to npz-of-leaves if orbax is unhappy
    (keeps checkpointing working in minimal environments)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = {"state": state, "key": key}
    try:
        import orbax.checkpoint as ocp

        path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()
        return path
    except Exception:
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

        ckptr = ocp.StandardCheckpointer()
        try:
            return ckptr.restore(path, like)
        except Exception as e:
            # the natgrad state layout evolved during development (e.g. the
            # carried q_logdet entry); orbax reports a bare tree-structure
            # mismatch — say what it usually means
            raise RuntimeError(
                f"restore of {path} failed — most likely the checkpoint was "
                "written by an older build with a different TrainState "
                "layout (natvars entries changed across versions). "
                "Retrain or restart without --resume.") from e
    npz = path + ".npz"
    data = np.load(npz, allow_pickle=False)
    leaves = [data[k] for k in data.files if k != "treedef"]
    _, treedef = jax.tree.flatten(like)
    return jax.tree.unflatten(treedef, leaves)
