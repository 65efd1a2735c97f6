"""UNet depth regressors (TPU-native flax rebuild of reference model/unet.py).

Architecture parity with the reference:
  * UNet (reference model/unet.py:15-118): 8-down / 8-up encoder-decoder for
    256x256 inputs.  Encoder convs are k4 s2 p1 with LeakyReLU(0.2), decoder
    convs k3 s1 p1 with ReLU after bilinear 2x upsampling, skip concats at
    every level, BatchNorm everywhere except the first encoder conv, the
    encoder output, and the final decoder conv.
  * UNetMini (reference model/unet.py:121-186): 4-down / 4-up variant for
    unresized 240x320 inputs.

TPU-native choices: NHWC layout (XLA's native conv layout — channels on the
128-lane dimension), jax.image.resize for the bilinear upsample (half-pixel
convention, same as torch align_corners=False), BatchNorm with explicit
batch_stats collections.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")


class _ConvDown(nn.Module):
    """k4 s2 p1 halving conv (reference get_conv_layer + '4,2,1' usage)."""

    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
            dtype=self.dtype,
        )(x)


class _ConvSame(nn.Module):
    """k3 s1 p1 conv."""

    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype
        )(x)


class _BN(nn.Module):
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype,
        )(x)


class UNet(nn.Module):
    """Full 8-level UNet; input (B, 256, 256, C_in) -> (B, 256, 256, C_out)."""

    num_filters: int = 32
    channels_out: int = 1
    dtype: object = None  # e.g. jnp.bfloat16 for mixed precision (params stay f32)

    @nn.compact
    def __call__(self, x, train: bool = True):
        nf = self.num_filters
        dt = self.dtype
        if dt is not None:
            x = x.astype(dt)
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        relu = nn.relu
        bn = lambda v: _BN(dtype=dt)(v, train)

        e1 = _ConvDown(nf, dt)(x)                               # 128
        e2 = bn(_ConvDown(nf * 2, dt)(lrelu(e1)))               # 64
        e3 = bn(_ConvDown(nf * 4, dt)(lrelu(e2)))               # 32
        e4 = bn(_ConvDown(nf * 8, dt)(lrelu(e3)))               # 16
        e5 = bn(_ConvDown(nf * 8, dt)(lrelu(e4)))               # 8
        e6 = bn(_ConvDown(nf * 8, dt)(lrelu(e5)))               # 4
        e7 = bn(_ConvDown(nf * 8, dt)(lrelu(e6)))               # 2
        e8 = _ConvDown(nf * 8, dt)(lrelu(e7))                   # 1 (no BN)

        cat = lambda a, b: jnp.concatenate([a, b], axis=-1)
        d1 = cat(bn(_ConvSame(nf * 8, dt)(_upsample2x(relu(e8)))), e7)
        d2 = cat(bn(_ConvSame(nf * 8, dt)(_upsample2x(relu(d1)))), e6)
        d3 = cat(bn(_ConvSame(nf * 8, dt)(_upsample2x(relu(d2)))), e5)
        d4 = cat(bn(_ConvSame(nf * 8, dt)(_upsample2x(relu(d3)))), e4)
        d5 = cat(bn(_ConvSame(nf * 4, dt)(_upsample2x(relu(d4)))), e3)
        d6 = cat(bn(_ConvSame(nf * 2, dt)(_upsample2x(relu(d5)))), e2)
        d7 = cat(bn(_ConvSame(nf, dt)(_upsample2x(relu(d6)))), e1)
        d8 = _ConvSame(self.channels_out, dt)(_upsample2x(relu(d7)))
        return d8


class UNetMini(nn.Module):
    """4-level UNet for unresized inputs; (B, 240, 320, C_in) -> same spatial."""

    num_filters: int = 32
    channels_out: int = 1
    dtype: object = None  # e.g. jnp.bfloat16 for mixed precision (params stay f32)

    @nn.compact
    def __call__(self, x, train: bool = True):
        nf = self.num_filters
        dt = self.dtype
        if dt is not None:
            x = x.astype(dt)
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        relu = nn.relu
        bn = lambda v: _BN(dtype=dt)(v, train)

        e1 = _ConvDown(nf, dt)(x)                               # 120x160
        e2 = bn(_ConvDown(nf * 2, dt)(lrelu(e1)))               # 60x80
        e3 = bn(_ConvDown(nf * 4, dt)(lrelu(e2)))               # 30x40
        e4 = _ConvDown(nf * 8, dt)(lrelu(e3))                   # 15x20 (no BN)

        cat = lambda a, b: jnp.concatenate([a, b], axis=-1)
        d5 = cat(bn(_ConvSame(nf * 4, dt)(_upsample2x(relu(e4)))), e3)
        d6 = cat(bn(_ConvSame(nf * 2, dt)(_upsample2x(relu(d5)))), e2)
        d7 = cat(bn(_ConvSame(nf, dt)(_upsample2x(relu(d6)))), e1)
        d8 = _ConvSame(self.channels_out, dt)(_upsample2x(relu(d7)))
        return d8


def renormalize_depth(logits: jnp.ndarray, min_z: float, max_z: float) -> jnp.ndarray:
    """sigmoid then rescale into the per-dataset depth range
    (reference trainer/trainer_unet.py:55, trainer_scene_net.py:80)."""
    return jax.nn.sigmoid(logits) * (max_z - min_z) + min_z


def resize_crop_depth(depthmap: jnp.ndarray) -> jnp.ndarray:
    """Undo the square-pad-resize of the input: (B, 256, 256, 1) -> bilinear to
    (B, 320, 320, 1) -> crop rows 40:280 -> (B, 240, 320, 1)
    (reference trainer/trainer_scene_net.py:73-76)."""
    b, _, _, c = depthmap.shape
    resized = jax.image.resize(depthmap, (b, 320, 320, c), method="bilinear")
    return resized[:, 40:280, :, :]
