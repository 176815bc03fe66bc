"""Actor-critic MLP policy (SB3 'MlpPolicy' semantics) in Flax.

The reference delegates its learner to stable-baselines3 PPO with the default
MlpPolicy (reference examples/learn.py:72-75): separate pi/vf towers of
[64, 64] tanh units, a state-independent log-std Gaussian head initialized at
0, and orthogonal initialization (gain sqrt(2) hidden, 0.01 policy head, 1.0
value head).  This module reproduces that architecture natively in Flax so
the policy fuses into the jitted rollout/training program on TPU.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn
import numpy as np


class ActorCritic(nn.Module):
    """Separate-tower actor-critic with diagonal-Gaussian policy head."""

    action_dim: int
    hidden: Sequence[int] = (64, 64)
    log_std_init: float = 0.0
    # computation dtype for the Dense layers (params stay float32 master
    # weights; flax casts per-layer).  bfloat16 halves the HBM traffic of
    # the minibatch gradient passes, which the roofline shows are
    # memory-bound (artifacts/roofline.json: AI ~24 flops/byte vs machine
    # balance ~120).  Outputs are cast back to float32 for the loss.
    compute_dtype: object = None

    @nn.compact
    def __call__(self, obs: jnp.ndarray):
        ortho = nn.initializers.orthogonal
        cd = self.compute_dtype
        x = obs if cd is None else obs.astype(cd)
        for h in self.hidden:
            x = nn.tanh(nn.Dense(h, kernel_init=ortho(np.sqrt(2)),
                                 bias_init=nn.initializers.zeros,
                                 dtype=cd)(x))
        mean = nn.Dense(self.action_dim, kernel_init=ortho(0.01),
                        bias_init=nn.initializers.zeros, dtype=cd)(x)
        log_std = self.param(
            "log_std",
            nn.initializers.constant(self.log_std_init),
            (self.action_dim,))

        v = obs if cd is None else obs.astype(cd)
        for h in self.hidden:
            v = nn.tanh(nn.Dense(h, kernel_init=ortho(np.sqrt(2)),
                                 bias_init=nn.initializers.zeros,
                                 dtype=cd)(v))
        value = nn.Dense(1, kernel_init=ortho(1.0),
                         bias_init=nn.initializers.zeros, dtype=cd)(v)
        if cd is not None:
            mean = mean.astype(jnp.float32)
            value = value.astype(jnp.float32)
        return mean, log_std, jnp.squeeze(value, axis=-1)


def gaussian_log_prob(mean, log_std, action):
    """Diagonal-Gaussian log pdf summed over the action dimension."""
    var = jnp.exp(2 * log_std)
    return jnp.sum(
        -0.5 * ((action - mean) ** 2 / var + 2 * log_std
                + jnp.log(2 * jnp.pi)), axis=-1)


def gaussian_entropy(log_std):
    """Entropy of the diagonal Gaussian (state-independent)."""
    return jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e), axis=-1)
