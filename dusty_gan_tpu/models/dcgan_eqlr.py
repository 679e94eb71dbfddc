"""Equalized-LR DCGAN backbone for LiDAR range images, NHWC / TPU-native.

Architecture parity with ``models/gans/dcgan_eqlr.py``:

Generator (dcgan_eqlr.py:49-72), shape (64,256), in_ch=512:
  z (B,512)
  -> Proj: one MXU matmul to (B,4,16,512) + FusedLeakyReLU        [:6-16]
  -> 3x Up: ring-pad 1; ConvT k4 s2 p3 (as lhs-dilated conv);
     FusedLeakyReLU  -> (B,8,32,256)->(B,16,64,128)->(B,32,128,64) [:19-26]
  -> Head per output key: ring-pad 1; ConvT k4 s2 p3 (with bias)   [:29-46]
  -> tanh on "depth" only                                          [:69-72]

Discriminator (dcgan_eqlr.py:75-96), in_ch=1:
  x (B,64,256,1) -> BlurVH -> (B,64,256,2)
  -> 4x Down: ring-pad 1; conv k4 s2 VALID; FusedLeakyReLU
  -> EqualLR conv k(4,16) -> (B,1,1,1) logit
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

import math

from dusty_gan_tpu.ops.blur import blur_vh
from dusty_gan_tpu.ops.linear import (
    EqualLRConv,
    EqualLRConvTranspose,
    EqualLRProj,
    FusedLeakyReLU,
    _convt_k4s2p3_subpixel,
    _normal_init,
)
from dusty_gan_tpu.ops.padding import pad_ring


def _hpad_mode(ring: bool) -> str:
    return "circular" if ring else "reflect"


class Up(nn.Module):
    """ring-pad 1 -> ConvT(k4, s2, p=1+2) -> FusedLeakyReLU (dcgan_eqlr.py:19-26)."""

    features: int
    ring: bool = True

    @nn.compact
    def __call__(self, x, compute_dtype=None):
        h = pad_ring(x, 1, horizontal=_hpad_mode(self.ring), vertical="reflect")
        h = EqualLRConvTranspose(self.features, (4, 4), (2, 2), (3, 3), use_bias=False)(
            h, compute_dtype
        )
        return FusedLeakyReLU(self.features)(h)


class _ConvTParams(nn.Module):
    """Parameter holder matching EqualLRConvTranspose's tree
    ({kernel, bias}) so merged-head checkpoints stay name-compatible."""

    features: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, in_ch: int):
        k = self.param("kernel", _normal_init, (4, 4, in_ch, self.features), self.param_dtype)
        b = self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
        return k, b


class Head(nn.Module):
    """Per-output-key ConvT head (dcgan_eqlr.py:29-46).

    The per-key convolutions (1-2 output channels each) are merged into ONE
    ConvT over the concatenated kernels and split afterwards: per-channel
    math is identical, but a single conv with O=sum(out_ch) replaces
    len(out_ch) MXU-starved O<=2 kernels in both forward and backward
    (profiling: the separate heads cost ~0.5 ms/step at <3 TF/s).
    Each key keeps its own equalized-LR scale (fan-in quirk uses that
    key's own output width)."""

    out_ch: Dict[str, int]
    ring: bool = True

    @nn.compact
    def __call__(self, x, compute_dtype=None):
        dtype = compute_dtype or x.dtype
        in_ch = x.shape[-1]
        h = pad_ring(x, 1, horizontal=_hpad_mode(self.ring), vertical="reflect")
        ks, bs = [], []
        for name, ch in self.out_ch.items():
            k, b = _ConvTParams(ch, name=f"head_{name}")(in_ch)
            scale = 1.0 / math.sqrt(ch * 16)  # ConvT fan-in quirk: O*kh*kw
            ks.append((k * scale).astype(dtype))
            bs.append(b)
        w = jnp.concatenate(ks, axis=-1)
        bias = jnp.concatenate(bs)
        y = _convt_k4s2p3_subpixel(h.astype(dtype), w)
        y = y + bias.astype(y.dtype)
        outs, off = {}, 0
        for name, ch in self.out_ch.items():
            outs[name] = y[..., off : off + ch]
            off += ch
        return outs


class Generator(nn.Module):
    in_ch: int = 512
    out_ch: Any = None  # dict name->channels; default {"depth": 1}
    ch_base: int = 64
    ch_max: int = 512
    shape: Sequence[int] = (64, 256)
    ring: bool = True

    def ch(self, i: int) -> int:
        return min(self.ch_base << i, self.ch_max)

    @nn.compact
    def __call__(self, z, compute_dtype=None, compose_layer=None, compose_alpha=None):
        """compose_layer/compose_alpha: multi-code mGANprior composition
        (the flax analog of the reference demo's forward-hook feature
        blending, demo.py:474-488): run stages 0..compose_layer on all N
        latents, blend feature maps as sum(alpha * h, axis=0), continue
        with batch 1.  compose_layer in {0: after proj, 1..3: after up0..2};
        compose_alpha: (N, 1, 1, C) weights."""
        out_ch = dict(self.out_ch or {"depth": 1})
        h0, w0 = self.shape[0] >> 4, self.shape[1] >> 4
        h = EqualLRProj(self.ch(3), (h0, w0), name="proj")(z, compute_dtype)
        h = FusedLeakyReLU(self.ch(3), name="proj_act")(h)
        if compose_layer == 0:
            h = jnp.sum(h * compose_alpha, axis=0, keepdims=True)
        for idx, i in enumerate((2, 1, 0)):
            h = Up(self.ch(i), self.ring, name=f"up{idx}")(h, compute_dtype)
            if compose_layer == idx + 1:
                h = jnp.sum(h * compose_alpha, axis=0, keepdims=True)
        outs = Head(out_ch, self.ring, name="head")(h, compute_dtype)
        outs["depth"] = jnp.tanh(outs["depth"].astype(jnp.float32))
        return outs


class Down(nn.Module):
    """ring-pad 1 -> conv k4 s2 VALID -> FusedLeakyReLU (dcgan_eqlr.py:75-82)."""

    features: int
    ring: bool = True
    precision: Any = None
    split_lhs: bool = False

    @nn.compact
    def __call__(self, x, compute_dtype=None):
        h = pad_ring(x, 1, horizontal=_hpad_mode(self.ring), vertical="reflect")
        h = EqualLRConv(self.features, (4, 4), (2, 2), use_bias=False,
                        precision=self.precision,
                        split_lhs=self.split_lhs)(h, compute_dtype)
        return FusedLeakyReLU(self.features)(h)


class Discriminator(nn.Module):
    """The input boundary stays f32 (``input_f32``, default on): the tanh
    inverse-depth domain saturates near -1 exactly where LiDAR range lives
    (30 m -> -0.955, 94 m -> -0.996, dropped -> -1), so a bf16 cast of the
    image leaves ~110 distinct depth levels and maps every return beyond
    ~106 m onto the dropped constant — measured at JSD 0.038 vs the 0.003
    train/test floor from the cast alone (round-5 diagnosis; the reference
    trains under fp16 AMP whose 10-bit mantissa is transparent here,
    trainers/dcgan_amp.py). blur_vh is shifts+adds (dtype-preserving) and
    ``down0`` consumes the image through a hi/lo operand split (see
    ``input_precision``); the interior, which sees well-scaled
    activations instead of saturated depths, keeps bf16/MXU speed."""

    in_ch: int = 1
    ch_base: int = 64
    ch_max: int = 512
    shape: Sequence[int] = (64, 256)
    ring: bool = True
    input_f32: bool = True
    # how down0 preserves the image mantissa (measured on v5e, full train
    # step): "split" (default) decomposes the image into hi/lo bf16
    # channels with tied kernels — ~16 operand mantissa bits (vs the ~11
    # the fp16 reference sees) on the plain bf16 MXU path, ~0.3 ms/step
    # over a blind bf16 cast vs +1.8 ms for Precision.HIGH and +4.1 ms
    # for HIGHEST.  A lax.Precision value pins the conv's XLA precision
    # instead (HIGH/HIGHEST; DEFAULT would round the image operand to
    # bf16 and reintroduce the blindness, so it is never a valid choice).
    input_precision: Any = "split"

    def ch(self, i: int) -> int:
        return min(self.ch_base << i, self.ch_max)

    @nn.compact
    def __call__(self, x, compute_dtype=None):
        h_out, w_out = self.shape[0] >> 4, self.shape[1] >> 4
        h = blur_vh(x, self.ring)
        start = 0
        if self.input_f32 and h.dtype == jnp.float32:
            if self.input_precision == "split" and compute_dtype is not None:
                # reduce_precision, NOT an astype round-trip: XLA's
                # excess-precision folding elides convert(bf16->f32)
                # pairs, which silently turns the residual into x - x = 0
                # on TPU (observed; the CPU backend does not fold, so only
                # a chip run catches it)
                hi_f32 = jax.lax.reduce_precision(h, 8, 7)  # bf16 grid
                hi = hi_f32.astype(compute_dtype)  # exact regrid
                lo = (h - hi_f32).astype(compute_dtype)
                h = Down(self.ch(0), self.ring, name="down0",
                         split_lhs=True)(jnp.concatenate([hi, lo], -1),
                                         compute_dtype)
            else:
                # f32 compute (compute_dtype=None): splitting buys nothing,
                # pin full precision on the f32 operands instead
                prec = (jax.lax.Precision.HIGHEST
                        if self.input_precision == "split"
                        else self.input_precision)
                h = Down(self.ch(0), self.ring, name="down0",
                         precision=prec)(h, None)
                if compute_dtype is not None:
                    h = h.astype(compute_dtype)
            start = 1
        for idx in range(start, 4):
            h = Down(self.ch(idx), self.ring, name=f"down{idx}")(h, compute_dtype)
        # output boundary: accumulate the logit in f32.  A bf16 logit
        # quantizes at ~0.0078 — coarser than the reference's fp16 logit
        # (~0.001, trainers/dcgan_amp.py autocast) — and a far-field-only
        # perturbation shifts the logit by less than one bf16 ulp, so it
        # would be erased here even with the f32 input boundary above
        # (round-5 trace: delta alive at down3, zero after a bf16 final
        # conv).  Casting up and running the conv in f32 keeps MXU speed
        # (TPU DEFAULT rounds operands to bf16, accumulates f32) while
        # keeping differentiation dtype-uniform for the R1/GP vjp.
        if self.input_f32:
            h = h.astype(jnp.float32)
            compute_dtype = None
        logit = EqualLRConv(1, (h_out, w_out), (1, 1), use_bias=True, name="final")(
            h, compute_dtype
        )
        return logit.astype(jnp.float32)  # (B,1,1,1)
