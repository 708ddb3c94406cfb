"""Fused GMM state-likelihood Pallas kernel — scoring without the gather.

The baseline scoring path (`ops/gmm.py`) computes per-Gaussian scores
as one MXU matmul and then forms mixture (tied-state) likelihoods with
a `[T, Gp] -> [T, Sp, K]` gather + logsumexp, mirroring the reference's
pool-then-mixture split (`aku/Distributions.cc:2637-2710` likelihood
cache + `Mixture::compute_likelihood`, `aku/Distributions.cc:2079`).
Profiling on TPU v5e (benchmarks/profile_scoring.py, DESIGN.md roofline
note) shows that gather fusion is the scoring bottleneck: ~22 ms of a
36.6 ms state-likelihood call at T=32k/G=10k — ~15x off the chip's
streaming bandwidth, because TPUs have no hardware gather.

This kernel removes the gather by restructuring the tables on the host:
for each mixture component slot k the Gaussian columns are pre-gathered
into a dense slab ``We[k] = score_matrix[:, comp_idx[:, k]]`` with the
log mixture weight and Gaussian bias folded into an extra constant-one
input column.  The kernel then computes, entirely in VMEM per tile,

    e_k  = xq @ We[k]                 (one MXU matmul per component slot)
    m,s  = online-logsumexp update    (running max + rescaled exp sum)
    out  = m + log(s)                 ([T_tile, S_tile] written once)

so HBM traffic is just the inputs plus the final ``[T, Sp]`` result —
the ``[T, Gp]`` Gaussian matrix and the ``[T, Sp, K]`` gather never
exist.  Gaussians shared between mixtures are simply duplicated into
each slab (the expansion is ~2x for K=8 pools, 6.3 MB -> 12.6 MB of
weights; weights stream per column tile and stay resident across the
whole T grid).

Numerics: the matmul runs at ``precision=HIGHEST`` like the baseline;
results differ from the gather path only by the reduction reordering of
logsumexp (measured max |delta| ~2e-4 on the bench model — below the
2-byte LNA quantization step of 1/1820).  The byte-exact LNA parity
path (`models/phone_probs.py`) keeps the baseline scorer; this kernel
is the TPU serving/bench fast path, opted into explicitly.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from aaltoasr_tpu.ops.logsemiring import LOG_ZERO, SAFE_LOG_FLOOR

TILE_T = 256
TILE_S = 512
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(xq_ref, we_ref, out_ref, *, K):
    """One (T_tile, S_tile) output block: K matmul slabs folded by an
    online logsumexp (running max m, rescaled sum s)."""
    f32 = jnp.float32
    hi = jax.lax.Precision.HIGHEST
    xq = xq_ref[...]
    m = jnp.dot(xq, we_ref[0], preferred_element_type=f32, precision=hi)
    s = jnp.ones_like(m)
    for k in range(1, K):
        e = jnp.dot(xq, we_ref[k], preferred_element_type=f32,
                    precision=hi)
        m2 = jnp.maximum(m, e)
        # exp args are <= 0; LOG_ZERO-padded slots underflow to 0
        s = s * jnp.exp(m - m2) + jnp.exp(e - m2)
        m = m2
    # fully-padded state columns: every slab is ~LOG_ZERO -> stay there
    out_ref[...] = jnp.where(m <= LOG_ZERO / 2, LOG_ZERO,
                             m + jnp.log(s))


@dataclass(frozen=True)
class FusedGmmScorer:
    """Device tables for the fused state-likelihood kernel.

    we  [K, Dq, Spp]  per-component-slot weight slabs; row ``2*dim``
                      carries the folded bias (constant-one column),
                      Dq = 2*dim+1 rounded up to 128.
    """

    dim: int
    num_states: int
    we: jax.Array

    @classmethod
    def from_scorer(cls, scorer) -> "FusedGmmScorer":
        """Build from a diagonal-covariance `GmmScorer` (no full-cov /
        subspace / cluster-gated models — those keep the base path)."""
        if scorer.full_cov or scorer.sub_basis or (
                scorer.cluster_of is not None):
            raise ValueError(
                "fused scoring supports plain diagonal GMMs only")
        A = np.asarray(scorer.score_matrix)        # [2D, Gp]
        b = np.asarray(scorer.score_bias)          # [Gp]
        ci = np.asarray(scorer.comp_idx)           # [Sp, K]
        cw = np.asarray(scorer.comp_logw)          # [Sp, K]
        Sp, K = ci.shape
        if K > 32:
            raise ValueError(f"K={K} component slots exceed the VMEM "
                             "budget of the fused kernel")
        D2 = A.shape[0]
        Dq = _round_up(D2 + 1, _LANE)
        Spp = _round_up(max(Sp, scorer.num_states), TILE_S)
        we = np.zeros((K, Dq, Spp), dtype=np.float32)
        for k in range(K):
            we[k, :D2, :Sp] = A[:, ci[:, k]]
            # folded bias: Gaussian constant + log mixture weight
            # (LOG_ZERO-padded slots stay LOG_ZERO: b+cw ~ -1e30)
            we[k, D2, :Sp] = np.maximum(b[ci[:, k]] + cw[:, k], LOG_ZERO)
            we[k, D2, Sp:] = LOG_ZERO
        return cls(dim=scorer.dim, num_states=scorer.num_states,
                   we=jnp.asarray(we))

    def state_log_likelihoods(self, features: jax.Array,
                              interpret: bool | None = None) -> jax.Array:
        """[T, D] -> [T, Spp] tied-state log-likelihoods (same math as
        `GmmScorer.state_log_likelihoods` up to reduction order).

        interpret=None auto-selects the Pallas interpreter on non-TPU
        backends so the fused path stays runnable (slowly) on CPU."""
        if interpret is None:
            interpret = jax.default_backend() not in ("tpu", "axon")
        return _fused_state_ll(features, self.we, self.dim,
                               interpret=interpret)

    def lna_log_probs(self, features: jax.Array,
                      interpret: bool | None = None) -> jax.Array:
        """[T, D] -> [T, S] LNA-normalized log-probs
        (`aku/PhoneProbsToolbox.cc:93-105` semantics)."""
        from aaltoasr_tpu.ops.logsemiring import logsumexp
        ll = self.state_log_likelihoods(features, interpret=interpret)
        ll = ll[:, :self.num_states]
        norm = logsumexp(ll, axis=-1, keepdims=True)
        return jnp.maximum(ll - norm, SAFE_LOG_FLOOR)


@functools.partial(jax.jit, static_argnames=("dim", "interpret"))
def _fused_state_ll(features, we, dim, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, Dq, Spp = we.shape
    x = features.astype(jnp.float32)
    T = x.shape[0]
    # xq = [x*x, x, 1, 0...] so the matmul adds the folded bias row
    one = jnp.ones((T, 1), jnp.float32)
    xq = jnp.concatenate([x * x, x, one], axis=-1)
    xq = jnp.pad(xq, ((0, _round_up(max(T, 8), TILE_T) - T),
                      (0, Dq - xq.shape[1])))
    Tp = xq.shape[0]
    grid = (Tp // TILE_T, Spp // TILE_S)
    mem = pl.ANY if interpret else pltpu.VMEM
    out = pl.pallas_call(
        functools.partial(_kernel, K=K),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_T, Dq), lambda i, j: (i, 0),
                         memory_space=mem),
            pl.BlockSpec((K, Dq, TILE_S), lambda i, j: (0, 0, j),
                         memory_space=mem),
        ],
        out_specs=pl.BlockSpec((TILE_T, TILE_S), lambda i, j: (i, j),
                               memory_space=mem),
        out_shape=jax.ShapeDtypeStruct((Tp, Spp), jnp.float32),
        interpret=interpret,
    )(xq, we)
    return out[:T]
