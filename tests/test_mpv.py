"""Multipath-Viterbi segmentation (`stats -M mpv`,
aku/HmmNetBaumWelch.hh:85, .cc:904-985)."""

import numpy as np
import pytest

import jax.numpy as jnp

from aaltoasr_tpu.models.hmm import TransitionTable, build_chain, pad_chain
from aaltoasr_tpu.models.hmmnet import (
    compile_hmmnet, pad_hmmnet, transcript_hmmnet)
from aaltoasr_tpu.train import estep
from aaltoasr_tpu.ops.logsemiring import LOG_ZERO

from tests.test_train import three_state_model


def np_mpv_fb(obs, graph):
    """Float64 mirror of the reference mpv recursion: backward grouped
    max with per-frame arc realization (HmmNetBaumWelch.cc:904-985),
    forward plain sum over realized arcs only (:1190-1330)."""
    T, P = obs.shape
    in_src = np.asarray(graph["in_src"])
    in_logp = np.asarray(graph["in_logp"])
    out_tgt = np.asarray(graph["out_tgt"])
    out_logp = np.asarray(graph["out_logp"])
    gid = np.asarray(graph["mpv_gid"])
    entry = np.asarray(estep._entry(graph, P))
    final = np.asarray(estep._final(graph, P))

    def realize(val):
        real = np.zeros(P, bool)
        for g in set(gid.tolist()):
            members = np.flatnonzero(gid == g)
            i = members[np.argmax(val[members])]
            if val[i] > LOG_ZERO / 2:
                real[i] = True
        return real

    beta = np.full((T, P), LOG_ZERO)
    beta[T - 1] = final
    realized = np.zeros((T, P), bool)
    for t in range(T - 2, -1, -1):
        val = obs[t + 1] + beta[t + 1]
        realized[t + 1] = realize(val)
        rv = np.where(realized[t + 1], val, LOG_ZERO)
        for p in range(P):
            beta[t, p] = max(
                np.logaddexp.reduce(out_logp[p] + rv[out_tgt[p]]),
                LOG_ZERO)
    realized[0] = realize(obs[0] + beta[0])
    total = np.logaddexp.reduce(
        np.where(realized[0], entry + obs[0] + beta[0], LOG_ZERO))

    alpha = np.full((T, P), LOG_ZERO)
    alpha[0] = np.where(realized[0],
                        np.maximum(obs[0] + entry, LOG_ZERO), LOG_ZERO)
    for t in range(1, T):
        for p in range(P):
            a = np.logaddexp.reduce(alpha[t - 1, in_src[p]]
                                    + in_logp[p]) + obs[t, p]
            alpha[t, p] = max(a, LOG_ZERO) if realized[t, p] else LOG_ZERO
    gamma = np.exp(np.maximum(alpha + beta - total, -700)) * realized
    gamma /= np.maximum(gamma.sum(axis=1, keepdims=True), 1e-30)
    return gamma, total


def toy_graph(seed=0, labels=("a", "a", "_")):
    model = three_state_model(seed=seed)
    table = TransitionTable.from_model(model)
    fst = transcript_hmmnet(model, table, list(labels),
                            silence_in_between=False)
    graph, emit = compile_hmmnet(fst, table)
    return model, table, graph


class TestMpv:
    def test_matches_float64_mirror(self):
        model, table, graph = toy_graph(seed=1)
        P = int(graph["num_positions"])
        padded = pad_hmmnet(graph, P + 3, fan=4)
        rng = np.random.default_rng(2)
        T = 12
        Pp = padded["pdf"].shape[0]
        obs = rng.normal(-3, 1.5, (T, Pp)).astype(np.float32)
        obs += np.asarray(padded["obs_const"])[None, :]
        g = {k: jnp.asarray(v) if isinstance(v, np.ndarray) else v
             for k, v in padded.items()}
        gamma, trans, total = estep.masked_multipath_viterbi_fb(
            jnp.asarray(obs), g, jnp.int32(T), table.num_slots)
        gamma_np, total_np = np_mpv_fb(obs.astype(np.float64), padded)
        assert float(total) == pytest.approx(total_np, rel=1e-4)
        np.testing.assert_allclose(np.asarray(gamma), gamma_np,
                                   atol=2e-3)

    def test_singleton_groups_equal_bw(self):
        model, table, graph = toy_graph(seed=3)
        P = int(graph["num_positions"])
        padded = pad_hmmnet(graph, P + 2, fan=4)
        rng = np.random.default_rng(4)
        T = 10
        Pp = padded["pdf"].shape[0]
        obs = rng.normal(-3, 1.5, (T, Pp)).astype(np.float32)
        g = {k: jnp.asarray(v) if isinstance(v, np.ndarray) else v
             for k, v in padded.items()}
        # distinct group per position -> every arc is realized
        # -> the recursion degenerates to plain Baum-Welch
        g_single = dict(g)
        g_single["mpv_gid"] = jnp.arange(Pp, dtype=jnp.int32)
        gm, _, tm = estep.masked_multipath_viterbi_fb(
            jnp.asarray(obs), g_single, jnp.int32(T), table.num_slots)
        gb, _, tb = estep.masked_forward_backward(
            jnp.asarray(obs), g, jnp.int32(T), table.num_slots)
        assert float(tm) == pytest.approx(float(tb), rel=1e-5)
        np.testing.assert_allclose(np.asarray(gm), np.asarray(gb),
                                   atol=1e-4)

    def test_total_between_viterbi_and_bw(self):
        model, table, graph = toy_graph(seed=5, labels=("a", "_", "a"))
        P = int(graph["num_positions"])
        padded = pad_hmmnet(graph, P, fan=4)
        rng = np.random.default_rng(6)
        T = 14
        obs = rng.normal(-3, 1.5, (T, P)).astype(np.float32)
        g = {k: jnp.asarray(v) if isinstance(v, np.ndarray) else v
             for k, v in padded.items()}
        obs_c = jnp.asarray(obs) + g["obs_const"][None, :]
        _, tv = estep.masked_viterbi(obs_c, g, jnp.int32(T))
        _, _, tm = estep.masked_multipath_viterbi_fb(
            obs_c, g, jnp.int32(T), table.num_slots)
        _, _, tb = estep.masked_forward_backward(
            obs_c, g, jnp.int32(T), table.num_slots)
        assert float(tv) <= float(tm) + 1e-4
        assert float(tm) <= float(tb) + 1e-4

    def test_chain_stats_mode_mpv(self):
        """End to end through chain_stats + the stats mode plumbing."""
        from aaltoasr_tpu.ops.gmm import GmmScorer
        model, table, graph = toy_graph(seed=7)
        P = int(graph["num_positions"])
        padded = pad_hmmnet(graph, P, fan=4)
        scorer = GmmScorer.from_model(model)
        rng = np.random.default_rng(8)
        T = 10
        feats = rng.normal(0, 2, (T, model.dim)).astype(np.float32)
        g = {k: jnp.asarray(v) if isinstance(v, np.ndarray) else v
             for k, v in padded.items()}
        out = estep.chain_stats(scorer, jnp.asarray(feats), g,
                                jnp.int32(T), table.num_slots,
                                mode="mpv")
        assert np.isfinite(float(out["log_likelihood"]))
        # occupancies: one frame of mass per frame
        assert float(jnp.sum(out["gamma"])) == pytest.approx(T, rel=1e-3)

    def test_instances_exported(self):
        model, table, graph = toy_graph(seed=9, labels=("a", "a"))
        inst = np.asarray(graph["inst"])
        pdfs = np.asarray(graph["pdf"])
        # two 'a' instances + the optional boundary silences: each a
        # distinct instance; the two 'a' groups have identical pdf
        # multisets but different ids
        groups = [np.sort(pdfs[inst == i]).tolist()
                  for i in np.unique(inst)]
        a_groups = [g for g in groups if 0 in g]
        assert len(a_groups) == 2
        assert a_groups[0] == a_groups[1]
