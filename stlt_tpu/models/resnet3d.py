"""3D ResNet (R3D) backbone in flax — channel-last, XLA conv3d.

Reference: ``src/modelling/resnets3d.py`` (generic BasicBlock/Bottleneck R3D,
depths 10–200; R3D-50 = Bottleneck [3,4,6,3]) as used by ``Resnet3D``
(``src/modelling/models.py:198-229``): built with ``n_classes=1139`` for the
Kinetics checkpoint, avgpool+fc stripped for feature extraction, and **all
BatchNorm3d layers frozen in eval mode** (affine params not trained, running
stats never updated — models.py:206-219).

TPU-first design decisions:

- activations are channel-LAST ``[B, T, H, W, C]`` (XLA's native conv layout
  on TPU; the converter transposes torch ``[O, I, kT, kH, kW]`` kernels);
- BatchNorm is a ``FrozenBatchNorm`` module whose scale/bias/mean/var live in
  ``params`` (the optimizer masks them out — see
  ``stlt_tpu.training.optimizer.frozen_stats_mask``), applied as a single
  fused multiply-add — at inference XLA folds it into the preceding conv;
- module names mirror the raw torch ResNet (conv1/bn1/layer1.{i}...) so the
  Kinetics checkpoint converts mechanically.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn
from jax.nn import initializers

R3D_STAGE_PLANES = (64, 128, 256, 512)
R3D_DEPTH_BLOCKS = {
    10: (1, 1, 1, 1),
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
    200: (3, 24, 36, 3),
}
R3D_BOTTLENECK_DEPTHS = (50, 101, 152, 200)


class FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm3d with loaded statistics (eps matches torch)."""

    features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", initializers.ones, (self.features,))
        bias = self.param("bias", initializers.zeros, (self.features,))
        mean = self.param("mean", initializers.zeros, (self.features,))
        var = self.param("var", initializers.ones, (self.features,))
        inv = scale / jnp.sqrt(var + self.eps)  # f32 stats math
        return x * inv.astype(self.dtype) + (bias - mean * inv).astype(self.dtype)


class StemConv(nn.Module):
    """R3D stem convolution with a space-to-depth fast path.

    The naive stem (kernel (t,7,7), spatial stride 2, C_in=3) runs at ~11
    TFLOP/s on v5e — the 3 input channels pad to a 128-wide MXU tile, and it
    alone was 82% of the whole R3D-50 forward. The mathematically EXACT
    space-to-depth regrouping (2×2 spatial blocks → 12 input channels,
    kernel (t,7,7)→(t,4,4) with a zero left tap, stride 1, padding (2,1))
    quadruples the contraction width. The stored parameter keeps the
    standard ``[t, 7, 7, 3, 64]`` layout, so checkpoints/converter/init are
    untouched; the kernel regroup happens on the fly (tiny, folded by XLA).
    Falls back to the plain convolution for odd spatial sizes.
    """

    conv1_t_size: int = 7
    conv1_t_stride: int = 1
    features: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax

        t = self.conv1_t_size
        in_c = x.shape[-1]
        kernel = self.param(
            "kernel",
            initializers.variance_scaling(2.0, "fan_out", "normal"),
            (t, 7, 7, in_c, self.features),
        )
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        t_pad = (t // 2, t // 2)
        B, T, H, W, _ = x.shape
        if H % 2 == 0 and W % 2 == 0:
            # space-to-depth: [B,T,H,W,C] → [B,T,H/2,W/2,4C] (p,q,c order)
            x2 = x.reshape(B, T, H // 2, 2, W // 2, 2, in_c)
            x2 = x2.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
                B, T, H // 2, W // 2, 4 * in_c
            )
            # kernel: left-pad the 7 spatial taps to 8 = 4 stride-2 pairs
            wp = jnp.pad(kernel, ((0, 0), (1, 0), (1, 0), (0, 0), (0, 0)))
            w2 = wp.reshape(t, 4, 2, 4, 2, in_c, self.features)
            w2 = w2.transpose(0, 1, 3, 2, 4, 5, 6).reshape(
                t, 4, 4, 4 * in_c, self.features
            )
            # No preferred_element_type=f32: the MXU accumulates bf16
            # products in f32 regardless (verified bit-identical output),
            # and an f32-typed conv output breaks the conv rhs-transpose in
            # the backward (f32 cotangent vs bf16 operands — the bf16 CACNF
            # TRAIN step failed on exactly this).
            return jax.lax.conv_general_dilated(
                x2, w2,
                window_strides=(self.conv1_t_stride, 1, 1),
                padding=(t_pad, (2, 1), (2, 1)),
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
        return jax.lax.conv_general_dilated(
            x, kernel,
            window_strides=(self.conv1_t_stride, 2, 2),
            padding=(t_pad, (3, 3), (3, 3)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )


def _conv(features: int, kernel: Tuple[int, int, int], strides, name: str, dtype):
    pad = tuple((k // 2, k // 2) for k in kernel)
    return nn.Conv(
        features=features,
        kernel_size=kernel,
        strides=strides,
        padding=pad,
        use_bias=False,
        dtype=dtype,
        kernel_init=initializers.variance_scaling(2.0, "fan_out", "normal"),
        name=name,
    )


class Bottleneck(nn.Module):
    planes: int
    strides: int = 1
    has_downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = (self.strides,) * 3
        residual = x
        h = _conv(self.planes, (1, 1, 1), (1, 1, 1), "conv1", self.dtype)(x)
        h = FrozenBatchNorm(self.planes, dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        h = _conv(self.planes, (3, 3, 3), s, "conv2", self.dtype)(h)
        h = FrozenBatchNorm(self.planes, dtype=self.dtype, name="bn2")(h)
        h = nn.relu(h)
        h = _conv(self.planes * 4, (1, 1, 1), (1, 1, 1), "conv3", self.dtype)(h)
        h = FrozenBatchNorm(self.planes * 4, dtype=self.dtype, name="bn3")(h)
        if self.has_downsample:
            residual = _conv(self.planes * 4, (1, 1, 1), s, "downsample_0", self.dtype)(x)
            residual = FrozenBatchNorm(
                self.planes * 4, dtype=self.dtype, name="downsample_1"
            )(residual)
        return nn.relu(h + residual)


class BasicBlock(nn.Module):
    planes: int
    strides: int = 1
    has_downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = (self.strides,) * 3
        residual = x
        h = _conv(self.planes, (3, 3, 3), s, "conv1", self.dtype)(x)
        h = FrozenBatchNorm(self.planes, dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        h = _conv(self.planes, (3, 3, 3), (1, 1, 1), "conv2", self.dtype)(h)
        h = FrozenBatchNorm(self.planes, dtype=self.dtype, name="bn2")(h)
        if self.has_downsample:
            residual = _conv(self.planes, (1, 1, 1), s, "downsample_0", self.dtype)(x)
            residual = FrozenBatchNorm(self.planes, dtype=self.dtype, name="downsample_1")(
                residual
            )
        return nn.relu(h + residual)


class ResNet3D(nn.Module):
    """R3D feature extractor. Input [B, T, H, W, 3] → [B, T', H', W', C_out]."""

    model_depth: int = 50
    conv1_t_size: int = 7
    conv1_t_stride: int = 1
    no_max_pool: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def out_features(self) -> int:
        expansion = 4 if self.model_depth in R3D_BOTTLENECK_DEPTHS else 1
        return R3D_STAGE_PLANES[-1] * expansion

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        blocks_per_stage = R3D_DEPTH_BLOCKS[self.model_depth]
        block_cls = (
            Bottleneck if self.model_depth in R3D_BOTTLENECK_DEPTHS else BasicBlock
        )
        expansion = 4 if block_cls is Bottleneck else 1
        h = StemConv(
            conv1_t_size=self.conv1_t_size,
            conv1_t_stride=self.conv1_t_stride,
            dtype=self.dtype,
            name="conv1",
        )(x)
        h = FrozenBatchNorm(64, dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        if not self.no_max_pool:
            h = nn.max_pool(
                h,
                window_shape=(3, 3, 3),
                strides=(2, 2, 2),
                padding=((1, 1), (1, 1), (1, 1)),
            )
        in_planes = 64
        for stage, (planes, num_blocks) in enumerate(
            zip(R3D_STAGE_PLANES, blocks_per_stage), start=1
        ):
            for b in range(num_blocks):
                strides = 2 if (stage > 1 and b == 0) else 1
                needs_ds = strides != 1 or in_planes != planes * expansion
                h = block_cls(
                    planes=planes,
                    strides=strides,
                    has_downsample=needs_ds and b == 0,
                    dtype=self.dtype,
                    name=f"layer{stage}.{b}",
                )(h)
                in_planes = planes * expansion
        return h
