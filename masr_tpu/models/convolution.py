"""Conformer convolution module (parity: conformer/convolution.py:10-148).

pointwise(2C) + GLU → depthwise(k) → norm + act → pointwise. Causal mode
left-pads by lorder=k-1 and threads a fixed-shape (B, lorder, C) ring cache
for streaming (convolution.py:101-109). Layout is channels-last (B, T, C)
throughout — the natural layout for TPU convolutions.
"""
from typing import Callable

import jax.numpy as jnp
import flax.linen as nn


class ConvolutionModule(nn.Module):
    channels: int
    kernel_size: int = 15
    activation: Callable = nn.silu
    norm: str = "layer_norm"  # 'batch_norm' | 'layer_norm'
    causal: bool = False
    bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @property
    def lorder(self):
        return self.kernel_size - 1 if self.causal else 0

    @nn.compact
    def __call__(self, x, mask_pad=None, cache=None, train: bool = False):
        """x: (B, T, C); mask_pad: (B, 1, T) bool non-pad mask;
        cache: (B, lorder, C) left-context for causal streaming.
        Returns (out (B, T, C), new_cache)."""
        if mask_pad is not None:
            x = jnp.where(mask_pad.transpose(0, 2, 1), x, 0.0)

        new_cache = None
        if self.causal:
            if cache is None:
                x = jnp.pad(x, ((0, 0), (self.lorder, 0), (0, 0)))
            else:
                x = jnp.concatenate([cache.astype(x.dtype), x], axis=1)
            new_cache = x[:, -self.lorder:, :]
            padding = "VALID"
        else:
            assert (self.kernel_size - 1) % 2 == 0
            padding = [((self.kernel_size - 1) // 2,) * 2]

        x = nn.Dense(2 * self.channels, use_bias=self.bias, dtype=self.dtype,
                     name="pointwise_conv1")(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * nn.sigmoid(b)  # GLU over channel dim

        x = nn.Conv(self.channels, (self.kernel_size,), padding=padding,
                    feature_group_count=self.channels, use_bias=self.bias,
                    dtype=self.dtype, name="depthwise_conv")(x)
        if self.norm == "layer_norm":
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        else:
            # momentum=0.9 keeps 90% of the old running stat — torch
            # BatchNorm1d's momentum=0.1 convention (flax's 0.99 default
            # would estimate eval stats 10× slower than the reference)
            x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                             momentum=0.9, dtype=self.dtype, name="norm")(x)
        x = self.activation(x)
        x = nn.Dense(self.channels, use_bias=self.bias, dtype=self.dtype,
                     name="pointwise_conv2")(x)
        if mask_pad is not None:
            x = jnp.where(mask_pad.transpose(0, 2, 1), x, 0.0)
        return x, new_cache
