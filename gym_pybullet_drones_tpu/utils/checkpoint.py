"""Checkpoint/resume for training state (env + policy + optimizer).

The reference has no simulation checkpointing (SURVEY.md §5.4 — model saves
are delegated to SB3's EvalCallback).  Here everything is an explicit pytree,
so one orbax save captures the COMPLETE run state — sharded env batch,
policy/optimizer parameters, PRNG key, and update counter — and training
resumes bit-exactly from it, across restarts and across device-mesh layouts
(orbax restores onto whatever sharding the target arrays specify).
"""
from __future__ import annotations

import os

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except ImportError:  # pragma: no cover
    _HAS_ORBAX = False

from gym_pybullet_drones_tpu.rl.ppo import TrainState


def _unkey(ts: TrainState) -> TrainState:
    """Typed PRNG keys are not serializable; store the raw key data."""
    return ts._replace(key=jax.random.key_data(ts.key))


def _rekey(ts: TrainState) -> TrainState:
    return ts._replace(key=jax.random.wrap_key_data(ts.key))


def save_checkpoint(path: str, train_state: TrainState, step: int | None = None):
    """Write the full TrainState; returns the checkpoint directory."""
    train_state = _unkey(train_state)
    path = os.path.abspath(path)
    if step is not None:
        path = os.path.join(path, f"step_{step}")
    if _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, train_state)
        ckptr.wait_until_finished()
    else:  # fallback: raw numpy pytree dump
        import pickle
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path + ".pkl", "wb") as f:
            pickle.dump(jax.tree.map(np.asarray, train_state), f)
    return path


def restore_checkpoint(path: str, target: TrainState) -> TrainState:
    """Restore onto `target`'s structure/shardings (abstract ok)."""
    target = _unkey(target)
    path = os.path.abspath(path)
    if _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        return _rekey(ckptr.restore(path, target))
    import pickle
    with open(path + ".pkl", "rb") as f:
        loaded = pickle.load(f)
    return _rekey(jax.tree.map(lambda t, l: jax.numpy.asarray(l), target,
                               loaded))
