"""Fused MFCC-core Pallas kernel: frames -> DFT -> mel -> DCT (+power).

The north-star frontend design (BASELINE.json): "Aku's FeatureGenerator
module graph ... becomes one fused Pallas kernel over batched
utterances".  XLA already fuses the elementwise glue between the three
matmuls, but the intermediate spectrum/mel arrays still round-trip
through HBM; this kernel keeps one frame tile resident in VMEM through
the whole chain:

    reim  = frames @ dft_basis          (window folded into the basis)
    power = re^2 + im^2  [-> sqrt if magnitude]
    pow_out = log(sum(power))           (PowerOp, optional second out)
    mel   = log1p(power @ mel_weights)  [or 10th root]
    out   = mel @ dct_matrix

Weights stay in VMEM across the whole grid (a few hundred KB).  Used by
`FeatureGenerator` when the module DAG matches the canonical
fft->{mel->dct, power} pattern on a TPU backend; other backends and
non-matching graphs use the unfused ops (identical math).  Gathers are
not needed anywhere, which is exactly the op mix this toolchain's
Mosaic supports (see the pallas feasibility notes in DESIGN.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

TILE = 128


def _kernel(frames_ref, dft_ref, mel_ref, dct_ref, out_ref, pow_ref,
            *, K, magnitude, root, with_power):
    f32 = jnp.float32
    hi = jax.lax.Precision.HIGHEST
    reim = jnp.dot(frames_ref[...], dft_ref[...],
                   preferred_element_type=f32, precision=hi)
    re = reim[:, :K]
    im = reim[:, K:]
    power = re * re + im * im
    spec = jnp.sqrt(power) if magnitude else power
    if with_power:
        # PowerOp consumes the fft OUTPUT (post-magnitude), not the
        # raw power spectrum
        pow_ref[...] = jnp.log(
            jnp.sum(spec, axis=-1, keepdims=True) + 1e-10)
    mel = jnp.dot(spec, mel_ref[...], preferred_element_type=f32,
                  precision=hi)
    v = jnp.power(mel, 0.1) if root else jnp.log1p(mel)
    out_ref[...] = jnp.dot(v, dct_ref[...],
                           preferred_element_type=f32, precision=hi)


@functools.partial(
    jax.jit, static_argnames=("magnitude", "root", "with_power",
                              "interpret"))
def mfcc_core(frames, dft_basis, mel_w, dct_m, magnitude=True,
              root=False, with_power=True, interpret=False):
    """[T, W] frames -> ([T, C] cepstra, [T, 1] log power or None)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, W = frames.shape
    K = dft_basis.shape[1] // 2
    C = dct_m.shape[1]
    Tp = -(-T // TILE) * TILE
    if Tp != T:
        frames = jnp.pad(frames, ((0, Tp - T), (0, 0)))
    grid = (Tp // TILE,)
    kernel = functools.partial(
        _kernel, K=K, magnitude=magnitude, root=root,
        with_power=with_power)
    out, pw = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, W), lambda i: (i, 0),
                         memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
            pl.BlockSpec(dft_basis.shape, lambda i: (0, 0),
                         memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
            pl.BlockSpec(mel_w.shape, lambda i: (0, 0),
                         memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
            pl.BlockSpec(dct_m.shape, lambda i: (0, 0),
                         memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE, C), lambda i: (i, 0),
                         memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                         memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Tp, C), jnp.float32),
            jax.ShapeDtypeStruct((Tp, 1), jnp.float32),
        ),
        interpret=interpret,
    )(frames.astype(jnp.float32), dft_basis, mel_w, dct_m)
    return out[:T], (pw[:T] if with_power else None)


def reference_core(frames, dft_basis, mel_w, dct_m, magnitude=True,
                   root=False, with_power=True):
    """Unfused XLA math, bit-for-bit the module ops' formulas."""
    hi = jax.lax.Precision.HIGHEST
    reim = jnp.dot(frames.astype(jnp.float32), dft_basis, precision=hi)
    K = dft_basis.shape[1] // 2
    re, im = reim[:, :K], reim[:, K:]
    power = re * re + im * im
    spec = jnp.sqrt(power) if magnitude else power
    pw = jnp.log(jnp.sum(spec, axis=-1, keepdims=True) + 1e-10) \
        if with_power else None
    mel = jnp.dot(spec, mel_w, precision=hi)
    v = jnp.power(mel, 0.1) if root else jnp.log1p(mel)
    return jnp.dot(v, dct_m, precision=hi), pw
