"""Convolutional actor-critic for RGB observations (SB3 'CnnPolicy' shape).

The reference trains MlpPolicy only (examples/learn.py:72-75); this model is
the natural extension for ObservationType.RGB — a NatureCNN-style trunk
(32/64/64 channels) shared by separate policy/value heads, operating on the
(N, 48, 64, 4) ray-traced observations from ops/render.py.  Convolutions
map onto the MXU; channel counts are kept MXU-friendly multiples.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn
import numpy as np


class ActorCriticCNN(nn.Module):
    """NatureCNN trunk + Gaussian policy / value heads.

    Input: (..., H, W, C) float32 in [0, 255] (scaled inside) — or the
    flattened equivalent, which is reshaped back using `image_shape`.
    """

    action_dim: int
    image_shape: tuple = (48, 64, 4)
    hidden: int = 512

    @nn.compact
    def __call__(self, obs: jnp.ndarray):
        ortho = nn.initializers.orthogonal
        h, w, c = self.image_shape
        x = obs.reshape(obs.shape[:-1] + (h, w, c)) \
            if obs.shape[-1] == h * w * c else obs
        x = x / 255.0
        for features, kernel, stride in ((32, 8, 4), (64, 4, 2), (64, 3, 1)):
            x = nn.relu(nn.Conv(features, (kernel, kernel),
                                strides=(stride, stride), padding="VALID",
                                kernel_init=ortho(np.sqrt(2)))(x))
        x = x.reshape(x.shape[:-3] + (-1,))
        trunk = nn.relu(nn.Dense(self.hidden,
                                 kernel_init=ortho(np.sqrt(2)))(x))
        mean = nn.Dense(self.action_dim, kernel_init=ortho(0.01))(trunk)
        log_std = self.param("log_std", nn.initializers.zeros,
                             (self.action_dim,))
        value = nn.Dense(1, kernel_init=ortho(1.0))(trunk)
        return mean, log_std, jnp.squeeze(value, axis=-1)
