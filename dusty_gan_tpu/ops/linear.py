"""Equalized-learning-rate convolution layers (ProGAN), TPU-native.

Reproduces the semantics of ``EqualLR`` (``models/ops/common.py:112-136``):
weights are initialized N(0,1) and scaled at *runtime* by
``1/sqrt(fan_in)`` where ``fan_in = weight[0].numel()`` in the PyTorch
layout.  Two consequences replicated exactly:

* ``nn.Conv2d``        weight (O,I,kh,kw) -> fan_in = I*kh*kw  (true fan-in)
* ``nn.ConvTranspose2d`` weight (I,O,kh,kw) -> fan_in = O*kh*kw  (reference
  quirk: per-*input*-channel slice, i.e. scaled by the OUTPUT side)

Transposed convolution is realized as an input-dilated convolution
(``lhs_dilation``) so XLA lowers it onto the MXU; the stride-2 / kernel-4 /
"pad 1+2 with a manual ring-pad of 1" scheme of the reference generator
(``models/gans/dcgan_eqlr.py:19-26``) reduces to: ring-pad 1, dilate 2,
VALID 4x4 conv.

All tensors NHWC; kernels are stored (kh, kw, I, O) in *torch-ConvT
semantics* for transposed convs (flipped at call time), and HWIO for
forward convs.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from dusty_gan_tpu.ops.activation import fused_leaky_relu
from dusty_gan_tpu.ops.padding import pad_ring

DIMS = ("NHWC", "HWIO", "NHWC")


def _normal_init(key, shape, dtype):
    return jax.random.normal(key, shape, dtype)


class EqualLRConv(nn.Module):
    """Stride-s VALID conv with runtime 1/sqrt(I*kh*kw) weight scaling.

    Padding is applied by the caller (ring padding precedes the conv in
    both G and D of the reference).
    """

    features: int
    kernel: Sequence[int] = (4, 4)
    stride: Sequence[int] = (2, 2)
    use_bias: bool = False
    gain: float = 1.0
    param_dtype: Any = jnp.float32
    # pin the conv's XLA precision (TPU's DEFAULT rounds f32 operands to
    # bf16; image-boundary layers need the full mantissa — see
    # Discriminator.input_f32)
    precision: Any = None
    # the input is a hi/lo operand split: x carries 2*in_ch channels
    # (hi = bf16(x), lo = bf16(x - hi)), the kernel is built for the TRUE
    # in_ch and applied tied to both halves — W@(hi+lo) at ~16 operand
    # mantissa bits on the plain bf16 MXU path (the lhs-only half of what
    # Precision.HIGH's 3-pass bf16 splitting does, at ~2/3 the cost; the
    # param tree is identical to the unsplit layer, so checkpoints are
    # interchangeable)
    split_lhs: bool = False

    @nn.compact
    def __call__(self, x, compute_dtype=None):
        kh, kw = self.kernel
        in_ch = x.shape[-1] // (2 if self.split_lhs else 1)
        w = self.param("kernel", _normal_init, (kh, kw, in_ch, self.features), self.param_dtype)
        scale = self.gain / math.sqrt(in_ch * kh * kw)
        dtype = compute_dtype or x.dtype
        w = (w * scale).astype(dtype)
        if self.split_lhs:
            w = jnp.concatenate([w, w], axis=2)
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), w,
            window_strides=tuple(self.stride),
            padding="VALID",
            dimension_numbers=DIMS,
            precision=self.precision,
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
            y = y + b.astype(y.dtype)
        return y


class EqualLRConvTranspose(nn.Module):
    """torch ``ConvTranspose2d(k, s, p)`` semantics with equalized LR.

    Implemented as lhs-dilated conv: dilate input by s, pad by (k-1-p),
    correlate with the spatially-flipped kernel.  The equalized-LR scale
    uses the reference's ConvT fan-in quirk: ``O*kh*kw``.
    """

    features: int
    kernel: Sequence[int] = (4, 4)
    stride: Sequence[int] = (2, 2)
    padding: Sequence[int] = (3, 3)  # torch ConvT padding arg
    use_bias: bool = False
    gain: float = 1.0
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, compute_dtype=None):
        kh, kw = self.kernel
        in_ch = x.shape[-1]
        # stored (kh, kw, I, O); w[h, w, i, o] == torch_weight[i, o, h, w]
        w = self.param("kernel", _normal_init, (kh, kw, in_ch, self.features), self.param_dtype)
        scale = self.gain / math.sqrt(self.features * kh * kw)
        dtype = compute_dtype or x.dtype
        w = (w * scale).astype(dtype)
        x = x.astype(dtype)
        if (tuple(self.kernel), tuple(self.stride), tuple(self.padding)) == (
            (4, 4), (2, 2), (3, 3)
        ):
            y = _convt_k4s2p3_subpixel(x, w)
        else:
            wf = w[::-1, ::-1]  # ConvT == correlation with flipped kernel
            ph = kh - 1 - self.padding[0]
            pw = kw - 1 - self.padding[1]
            assert ph >= 0 and pw >= 0, "use explicit cropping for negative pads"
            y = jax.lax.conv_general_dilated(
                x, wf,
                window_strides=(1, 1),
                padding=((ph, ph), (pw, pw)),
                lhs_dilation=tuple(self.stride),
                dimension_numbers=DIMS,
            )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
            y = y + b.astype(y.dtype)
        return y


def _convt_k4s2p3_subpixel(x, w):
    """ConvT(k=4, s=2, p=3) as four 2x2 phase convolutions + interleave.

    The dilated-input formulation multiplies mostly zeros (and lowers
    poorly on TPU); the subpixel decomposition does exactly the ConvT
    FLOPs on dense tiles.  Derivation (per dimension, stored kernel w,
    correlation taps K[t] = w[3-t], input pre-padded by 1):

        out[2m]   = w[3] x[m]   + w[1] x[m+1]
        out[2m+1] = w[2] x[m+1] + w[0] x[m+2]

    so phase a in {0,1} uses stored rows (3,1) at offset 0 / (2,0) at
    offset 1, and likewise for columns.  x: (B, I+2, J+2, C_in) ->
    (B, 2I, 2J, C_out).
    """
    b, ip2, jp2, _ = x.shape
    i, j = ip2 - 2, jp2 - 2
    roff = (0, 1)
    # phase (a,b) taps are stored rows (3,1)/(2,0) == strided slices of the
    # reversed kernel: w[::-1][a::2] — one strided slice instead of
    # slice+concat pairs (fewer ops, CSE-able across fwd/bwd calls)
    wrev = w[::-1, ::-1]

    phases = []
    for a in (0, 1):
        for bb in (0, 1):
            k_ab = wrev[a::2, bb::2]  # (2,2,I,O)
            xs = x[:, roff[a] : roff[a] + i + 1, roff[bb] : roff[bb] + j + 1]
            y_ab = jax.lax.conv_general_dilated(
                xs, k_ab, (1, 1), "VALID", dimension_numbers=DIMS
            )  # (B, i, j, O)
            phases.append(y_ab)
    y = jnp.stack(phases, axis=3)  # (B, i, j, 4, O)
    y = y.reshape(b, i, j, 2, 2, -1)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))  # (B, i, 2, j, 2, O)
    return y.reshape(b, 2 * i, 2 * j, -1)


class EqualLRProj(nn.Module):
    """Latent -> (H0, W0) feature map: ConvT(k=(H0,W0), s=1, p=0) on a 1x1
    input (``dcgan_eqlr.py:6-16``) is exactly a dense layer reshaped, so it
    runs as one MXU matmul:  out[b,h,w,o] = sum_i z[b,i] * W[i,o,h,w].
    """

    features: int
    shape: Sequence[int] = (4, 16)
    gain: float = 1.0
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, compute_dtype=None):
        h0, w0 = self.shape
        in_ch = z.shape[-1]
        # NOTE: storing this (I,h0,w0,O) to make the matmul operand a pure
        # reshape was tried and REGRESSED the step 10% on v5e — XLA's layout
        # assignment handles the (h0,w0,I,O) transpose better than the
        # "natural" layout it picks for the alternative. Keep as-is.
        w = self.param("kernel", _normal_init, (h0, w0, in_ch, self.features), self.param_dtype)
        scale = self.gain / math.sqrt(self.features * h0 * w0)  # ConvT fan-in quirk
        dtype = compute_dtype or z.dtype
        wm = (w * scale).astype(dtype).transpose(2, 0, 1, 3).reshape(in_ch, -1)
        y = z.astype(dtype) @ wm  # (B, h0*w0*features)
        return y.reshape(z.shape[0], h0, w0, self.features)


class FusedLeakyReLU(nn.Module):
    """Learnable per-channel bias + LeakyReLU(0.2) * sqrt(2)
    (``models/ops/common.py:91-109``)."""

    features: int
    negative_slope: float = 0.2
    gain: float = math.sqrt(2.0)
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b = self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
        return fused_leaky_relu(x, b, self.negative_slope, self.gain)
