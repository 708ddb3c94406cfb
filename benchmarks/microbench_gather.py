"""Micro-benchmark: gather/scatter patterns used by the dense decode
step vs one-hot matmul replacements, at the bench operating point
(B=64, N=11958 nodes, Nw=1001 word-end slots, S_lm=1003 LM states).

Measurement notes for the axon-relayed TPU:
* ``block_until_ready`` does NOT reliably wait — every timing must end
  in a host fetch of a scalar that data-depends on the result.
* Per-op time is the SLOPE between two scan lengths, which cancels the
  fixed dispatch + fetch cost of the relay.
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

R1, R2 = 512, 4096


def timeit(step, init):
    """step: carry -> carry (same pytree). Returns us/iteration."""
    def total(R):
        @jax.jit
        def run(c):
            c, _ = jax.lax.scan(lambda c, _: (step(c), None),
                                c, None, length=R)
            return jax.tree.reduce(
                lambda a, x: a + jnp.sum(x) * 1e-9, c,
                jnp.zeros((), jnp.float32))
        float(run(init))          # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(init))
            best = min(best, time.perf_counter() - t0)
        return best

    return (total(R2) - total(R1)) / (R2 - R1) * 1e6


def main():
    rng = np.random.default_rng(0)
    B, N, Nw, SLM, S = 64, 11958, 1001, 1003, 78
    E, CR = 32, 208

    am = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32))
    lmn = jnp.asarray(rng.integers(0, SLM, (B, N)).astype(np.int32))
    wn = jnp.asarray(np.sort(rng.choice(N, Nw, replace=False))
                     .astype(np.int32))
    bo = jnp.asarray(rng.normal(size=(SLM,)).astype(np.float32))
    obs = jnp.asarray(rng.normal(size=(B, S)).astype(np.float32))
    pdf = jnp.asarray(rng.integers(0, S, (N,)).astype(np.int32))
    tgt = jnp.asarray(rng.integers(0, N, (B, CR)).astype(np.int32))
    val = jnp.asarray(rng.normal(size=(B, CR)).astype(np.float32))
    r0 = jnp.asarray(rng.normal(size=(B, Nw)).astype(np.float32))
    lmw = jnp.take(lmn, wn, axis=1)

    def rot(c):
        """cheap carry perturbation so nothing is loop-invariant"""
        return c * 0.999 + 0.001

    print(f"{'pattern':36s} us/iter")

    t = timeit(lambda a: rot(a) + jnp.mean(
        jnp.take(a, wn, axis=1)) * 1e-9, am)
    print(f"{'static gather [B,Nw]<-[B,N]':36s} {t:8.1f}")

    onehot = jnp.zeros((Nw, N), jnp.bfloat16).at[
        jnp.arange(Nw), wn].set(1)
    t = timeit(lambda a: rot(a) + jnp.mean(jax.lax.dot_general(
        onehot, a.astype(jnp.bfloat16).T, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)) * 1e-9, am)
    print(f"{'one-hot matmul [Nw,N]@[N,B]':36s} {t:8.1f}")

    t = timeit(lambda a: rot(a) + jnp.mean(
        bo[(lmw + a[0, 0].astype(jnp.int32) % 2) % SLM]) * 1e-9, am)
    print(f"{'dyn gather [B,Nw]<-[1003]':36s} {t:8.1f}")

    def bo_mm(a):
        oh = ((lmw + a[0, 0].astype(jnp.int32) % 2) % SLM)[
            ..., None] == jnp.arange(SLM, dtype=jnp.int32)
        out = jax.lax.dot_general(
            oh.astype(jnp.bfloat16), bo.astype(jnp.bfloat16),
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return rot(a) + jnp.mean(out) * 1e-9
    t = timeit(bo_mm, am)
    print(f"{'dyn one-hot mm [B,Nw,1003]@[1003]':36s} {t:8.1f}")

    t = timeit(lambda a: rot(a) + jnp.mean(jnp.take(
        obs + a[0, 0], pdf, axis=1)) * 1e-9, am)
    print(f"{'static gather [B,N]<-[B,S]':36s} {t:8.1f}")

    oh_pdf = jnp.zeros((N, S), jnp.bfloat16).at[
        jnp.arange(N), pdf].set(1)
    t = timeit(lambda a: rot(a) + jnp.mean(jax.lax.dot_general(
        oh_pdf, (obs + a[0, 0]).astype(jnp.bfloat16).T,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)) * 1e-9, am)
    print(f"{'one-hot matmul [N,S]@[S,B]':36s} {t:8.1f}")

    t = timeit(lambda a: jax.vmap(
        lambda ab, tb, vb: ab.at[tb].max(vb))(rot(a), tgt, val), am)
    print(f"{'scatter-max [B,N]<-CR=208':36s} {t:8.1f}")

    def mm_merge(a):
        oh = (tgt[..., None] ==
              jnp.arange(N, dtype=jnp.int32)[None, None, :])
        s = jnp.where(oh, (val + a[0, 0])[..., None], -1e30)
        return jnp.maximum(rot(a), jnp.max(s, axis=1))
    t = timeit(mm_merge, am)
    print(f"{'masked-max [B,CR,N] merge':36s} {t:8.1f}")

    vals5 = jnp.asarray(rng.normal(size=(B, CR, 5)).astype(np.float32))

    def scat5(a):
        def one(tb, vb):
            return jnp.zeros((N, 5), jnp.float32).at[tb].add(vb)
        out = jax.vmap(one)(tgt, vals5 + a[0, 0])
        return rot(a) + jnp.mean(out) * 1e-9
    t = timeit(scat5, am)
    print(f"{'scatter-add [B,N,5]<-CR payload':36s} {t:8.1f}")

    def mm5(a):
        oh = (tgt[..., None] ==
              jnp.arange(N, dtype=jnp.int32)[None, None, :])
        out = jax.lax.dot_general(
            oh.astype(jnp.float32), vals5 + a[0, 0],
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return rot(a) + jnp.mean(out) * 1e-9
    t = timeit(mm5, am)
    print(f"{'one-hot matmul [B,N,CR]@[B,CR,5]':36s} {t:8.1f}")

    t = timeit(lambda a: rot(a) + jnp.mean(jax.lax.top_k(
        r0 + a[0, 0], E)[0]) * 1e-9, am)
    print(f"{'top_k E=32 [B,Nw]':36s} {t:8.1f}")

    t = timeit(rot, am)
    print(f"{'elementwise [B,N] fma':36s} {t:8.1f}")

    ce = jnp.asarray(rng.integers(0, Nw, (B, E)).astype(np.int32))
    t = timeit(lambda a: rot(a) + jnp.mean(jnp.take_along_axis(
        r0 + a[0, 0], ce, axis=1)) * 1e-9, am)
    print(f"{'dyn gather [B,E]<-[B,Nw]':36s} {t:8.1f}")


if __name__ == "__main__":
    main()
