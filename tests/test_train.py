"""Training-engine tests: chains, Viterbi, forward-backward, EM."""

import itertools

import numpy as np
import pytest

from aaltoasr_tpu.formats import model_io
from aaltoasr_tpu.models.hmm import (
    TransitionTable, build_chain, pad_chain)
from aaltoasr_tpu.ops.gmm import GmmScorer
from aaltoasr_tpu.train import estep
from aaltoasr_tpu.train.accumulators import HmmStats, ML_BUF
from aaltoasr_tpu.train.estimate import estimate_ml

import jax.numpy as jnp


def three_state_model(seed=0, D=4):
    """Phones 'a' (2 states) and '_' (1 state), 6 Gaussians."""
    rng = np.random.default_rng(seed)
    G = 6
    means = rng.normal(0, 3, (G, D))
    covars = rng.uniform(0.5, 2.0, (G, D))
    mixtures = [
        (np.array([0, 1], dtype=np.int32), np.array([0.6, 0.4])),
        (np.array([2, 3], dtype=np.int32), np.array([0.5, 0.5])),
        (np.array([4, 5], dtype=np.int32), np.array([0.7, 0.3])),
    ]
    phones = [model_io.HmmPhone("a", [0, 1]), model_io.HmmPhone("_", [2])]
    transitions = {
        0: [(0, 0.6), (1, 0.4)],
        1: [(0, 0.5), (1, 0.5)],
        2: [(0, 0.7), (1, 0.3)],
    }
    return model_io.HmmModel(
        dim=D, cov_type="diagonal_cov", means=means, covars=covars,
        mixtures=mixtures, phones=phones, transitions=transitions)


def np_forward_backward(obs, chain):
    """Edge-list FB oracle in float64 (independent of the scan code)."""
    T, P = obs.shape
    LOGZ = -1e30
    alpha = np.full((T, P), LOGZ)
    alpha[0, 0] = obs[0, 0]
    for t in range(1, T):
        for e in range(chain.num_edges):
            s, d = chain.edge_src[e], chain.edge_tgt[e]
            v = alpha[t - 1, s] + chain.edge_logp[e] + obs[t, d]
            alpha[t, d] = np.logaddexp(alpha[t, d], v)
    beta = np.full((T, P), LOGZ)
    beta[T - 1, P - 1] = chain.final_logp
    for t in range(T - 2, -1, -1):
        for e in range(chain.num_edges):
            s, d = chain.edge_src[e], chain.edge_tgt[e]
            v = chain.edge_logp[e] + obs[t + 1, d] + beta[t + 1, d]
            beta[t, s] = np.logaddexp(beta[t, s], v)
    total = alpha[T - 1, P - 1] + chain.final_logp
    gamma = np.exp(alpha + beta - total)
    return gamma, total


def np_viterbi(obs, chain):
    """Brute-force best path by full enumeration (tiny T, P only)."""
    T, P = obs.shape
    edges = {}
    for e in range(chain.num_edges):
        edges.setdefault(int(chain.edge_src[e]), []).append(
            (int(chain.edge_tgt[e]), float(chain.edge_logp[e])))
    best_score, best_path = -np.inf, None
    def rec(pos, t, score, path):
        nonlocal best_score, best_path
        score = score + obs[t, pos]
        if t == T - 1:
            if pos == P - 1 and score + chain.final_logp > best_score:
                best_score = score + chain.final_logp
                best_path = list(path) + [pos]
            return
        for (tgt, lp) in edges.get(pos, []):
            rec(tgt, t + 1, score + lp, path + [pos])
    rec(0, 0, 0.0, [])
    return np.array(best_path), best_score


class TestChain:
    def test_build_chain_structure(self):
        model = three_state_model()
        table = TransitionTable.from_model(model)
        chain = build_chain(model, table, ["a", "_", "a"])
        assert chain.num_positions == 5
        np.testing.assert_array_equal(chain.pdf, [0, 1, 2, 0, 1])
        # each position: self loop + forward edge; last exit is final
        assert chain.final_logp == pytest.approx(np.log(0.5))
        assert chain.num_edges == 9  # 5 self + 4 forward

    def test_transition_table_slots(self):
        model = three_state_model()
        table = TransitionTable.from_model(model)
        assert table.num_slots == 6
        np.testing.assert_array_equal(table.source, [0, 0, 1, 1, 2, 2])
        np.testing.assert_array_equal(table.offset, [0, 1, 0, 1, 0, 1])


class TestViterbiFB:
    def _setup(self, T=12, labels=("a", "_")):
        model = three_state_model()
        table = TransitionTable.from_model(model)
        chain = build_chain(model, table, list(labels))
        scorer = GmmScorer.from_model(model)
        rng = np.random.default_rng(42)
        X = rng.normal(0, 2, (T, model.dim)).astype(np.float32)
        sll = np.asarray(scorer.state_log_likelihoods(jnp.asarray(X)))
        obs = sll[:, chain.pdf].astype(np.float64)
        return model, table, chain, scorer, X, obs

    def test_viterbi_matches_bruteforce(self):
        model, table, chain, scorer, X, obs = self._setup(T=8)
        graph = {k: jnp.asarray(v) for k, v in
                 pad_chain(chain, chain.num_positions).items()}
        path, score = estep.masked_viterbi(
            jnp.asarray(obs, dtype=jnp.float32), graph,
            jnp.int32(obs.shape[0]))
        want_path, want_score = np_viterbi(obs, chain)
        np.testing.assert_array_equal(np.asarray(path), want_path)
        assert float(score) == pytest.approx(want_score, rel=1e-5)

    def test_fb_matches_oracle(self):
        model, table, chain, scorer, X, obs = self._setup(T=12)
        graph = {k: jnp.asarray(v) for k, v in
                 pad_chain(chain, chain.num_positions).items()}
        gamma, trans, total = estep.masked_forward_backward(
            jnp.asarray(obs, dtype=jnp.float32), graph,
            jnp.int32(obs.shape[0]), table.num_slots)
        want_gamma, want_total = np_forward_backward(obs, chain)
        assert float(total) == pytest.approx(want_total, rel=1e-5)
        np.testing.assert_allclose(np.asarray(gamma), want_gamma,
                                   atol=2e-4)
        # gammas sum to 1 over positions each frame
        np.testing.assert_allclose(
            np.asarray(gamma).sum(1), 1.0, atol=1e-4)
        # transition posteriors: per-state totals ~ expected visit counts
        tr = np.asarray(trans)
        assert tr.sum() == pytest.approx(obs.shape[0], abs=1e-2)

    def test_padding_invariance(self):
        model, table, chain, scorer, X, obs = self._setup(T=10)
        g1 = {k: jnp.asarray(v) for k, v in
              pad_chain(chain, chain.num_positions).items()}
        g2 = {k: jnp.asarray(v) for k, v in
              pad_chain(chain, chain.num_positions + 5, fan=4).items()}
        obs1 = jnp.asarray(obs, dtype=jnp.float32)
        obs2 = jnp.concatenate(
            [obs1, jnp.full((10, 5), -1.0, jnp.float32)], axis=1)
        gm1, tp1, t1 = estep.masked_forward_backward(
            obs1, g1, jnp.int32(10), table.num_slots)
        gm2, tp2, t2 = estep.masked_forward_backward(
            obs2, g2, jnp.int32(10), table.num_slots)
        assert float(t1) == pytest.approx(float(t2), rel=1e-6)
        np.testing.assert_allclose(np.asarray(gm2)[:, :3],
                                   np.asarray(gm1), atol=1e-5)
        np.testing.assert_allclose(np.asarray(tp1), np.asarray(tp2),
                                   atol=1e-4)

    def test_time_mask_invariance(self):
        # padding frames beyond n_frames must not change anything
        model, table, chain, scorer, X, obs = self._setup(T=9)
        graph = {k: jnp.asarray(v) for k, v in
                 pad_chain(chain, chain.num_positions).items()}
        obs1 = jnp.asarray(obs, dtype=jnp.float32)
        obs2 = jnp.concatenate(
            [obs1, jnp.zeros((4, obs.shape[1]), jnp.float32)], axis=0)
        gm1, tp1, t1 = estep.masked_forward_backward(
            obs1, graph, jnp.int32(9), table.num_slots)
        gm2, tp2, t2 = estep.masked_forward_backward(
            obs2, graph, jnp.int32(9), table.num_slots)
        assert float(t1) == pytest.approx(float(t2), rel=1e-6)
        np.testing.assert_allclose(np.asarray(gm2)[:9], np.asarray(gm1),
                                   atol=1e-5)
        assert np.asarray(gm2)[9:].sum() == 0.0


class TestEM:
    def test_chain_stats_shapes_and_mass(self):
        model = three_state_model()
        table = TransitionTable.from_model(model)
        chain = build_chain(model, table, ["a", "_"])
        scorer = GmmScorer.from_model(model)
        rng = np.random.default_rng(3)
        T = 20
        X = jnp.asarray(rng.normal(0, 2, (T, model.dim)).astype(np.float32))
        graph = {k: jnp.asarray(v) for k, v in
                 pad_chain(chain, chain.num_positions).items()}
        stats = estep.chain_stats(scorer, X, graph, jnp.int32(T),
                                  table.num_slots, mode="bw")
        # total Gaussian occupancy == number of frames
        assert float(stats["gamma"].sum()) == pytest.approx(T, rel=1e-4)
        assert float(stats["mix_gamma"].sum()) == pytest.approx(T, rel=1e-4)
        # first moment mass: sum over gaussians == sum of frames
        np.testing.assert_allclose(
            np.asarray(stats["mean_acc"]).sum(0),
            np.asarray(X).sum(0), rtol=1e-4, atol=1e-3)

    def test_em_increases_likelihood(self):
        true_model = three_state_model(seed=10)
        table = TransitionTable.from_model(true_model)
        chain = build_chain(true_model, table, ["a", "_"])
        graph = {k: jnp.asarray(v) for k, v in
                 pad_chain(chain, chain.num_positions).items()}

        # sample observations by walking the true chain
        rng = np.random.default_rng(11)
        T = 120
        pos, seq = 0, []
        for t in range(T):
            seq.append(pos)
            if pos < 2 and rng.uniform() < 0.45:
                pos += 1
        states = [int(chain.pdf[min(p, 2)]) for p in seq]
        X = np.zeros((T, true_model.dim), dtype=np.float32)
        for t, s in enumerate(states):
            idx, w = true_model.mixtures[s]
            g = idx[rng.choice(len(idx), p=w)]
            X[t] = rng.normal(true_model.means[g],
                              np.sqrt(true_model.covars[g]))

        # start from a perturbed model
        model = three_state_model(seed=99)
        lls = []
        for it in range(4):
            scorer = GmmScorer.from_model(model)
            dstats = estep.chain_stats(
                scorer, jnp.asarray(X), graph, jnp.int32(T),
                table.num_slots, mode="bw")
            lls.append(float(dstats["log_likelihood"]))
            stats = device_stats_to_hmm_stats(model, table, dstats)
            model = estimate_ml(model, table, stats, minvar=0.01)
        assert lls[1] > lls[0]
        assert lls[2] >= lls[1] - 1e-3
        assert lls[3] >= lls[2] - 1e-3

    def test_stats_dump_round_trip(self, tmp_path):
        model = three_state_model()
        table = TransitionTable.from_model(model)
        chain = build_chain(model, table, ["a", "_"])
        scorer = GmmScorer.from_model(model)
        rng = np.random.default_rng(5)
        X = jnp.asarray(rng.normal(0, 2, (15, model.dim)).astype(np.float32))
        graph = {k: jnp.asarray(v) for k, v in
                 pad_chain(chain, chain.num_positions).items()}
        dstats = estep.chain_stats(scorer, X, graph, jnp.int32(15),
                                   table.num_slots)
        stats = device_stats_to_hmm_stats(model, table, dstats)
        stats.dump(str(tmp_path / "s1"))

        # combine two copies -> doubled statistics (combine_stats path)
        combined = HmmStats.zeros(model, table)
        combined.load(str(tmp_path / "s1"), table)
        combined.load(str(tmp_path / "s1"), table)
        buf0 = stats.buffers[ML_BUF]
        bufc = combined.buffers[ML_BUF]
        np.testing.assert_allclose(bufc.gamma, 2 * buf0.gamma, rtol=1e-5)
        np.testing.assert_allclose(bufc.mean_acc, 2 * buf0.mean_acc,
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(combined.trans_acc, 2 * stats.trans_acc,
                                   rtol=1e-5, atol=1e-5)
        assert combined.num_ll == pytest.approx(2 * stats.num_ll, rel=1e-6)


def device_stats_to_hmm_stats(model, table, dstats) -> HmmStats:
    """Convert a device stats pytree to host HmmStats (ML buffer)."""
    from aaltoasr_tpu.train.driver import device_stats_to_hmm_stats as f
    return f(model, table, dstats)


class TestBatchedDriver:
    def test_batched_matches_sequential(self, tmp_path):
        """run_recipe_batched must produce identical statistics to the
        sequential path."""
        import wave
        from aaltoasr_tpu.formats import model_io as mio
        from aaltoasr_tpu.formats.recipe import Recipe
        from aaltoasr_tpu.train.driver import EStepDriver

        rng = np.random.default_rng(0)
        D = 13
        model = mio.HmmModel(
            dim=D, cov_type="diagonal_cov",
            means=rng.normal(0, 1, (4, D)),
            covars=np.ones((4, D)),
            mixtures=[(np.array([i], np.int32), np.array([1.0]))
                      for i in range(4)],
            phones=[mio.HmmPhone("a", [0, 1]), mio.HmmPhone("_", [2]),
                    mio.HmmPhone("b", [3])],
            transitions={i: [(0, .7), (1, .3)] for i in range(4)})
        cfgtext = """\
module
{
  name audio
  type audiofile
  sample_rate 16000
}
module
{
  name fft
  type fft
  sources audio
}
module
{
  name mel
  type mel
  sources fft
}
module
{
  name dct
  type dct
  sources mel
}
module
{
  name power
  type power
  sources fft
}
module
{
  name out
  type merge
  sources dct power
}
"""
        from aaltoasr_tpu.formats.feaconf import FeatureConfig
        cfg = FeatureConfig.parse(cfgtext)
        lines = []
        for u, (n, seq) in enumerate([(4000, "_ a b _"),
                                      (4200, "a b"),
                                      (4000, "b a _")]):
            sig = (2000 * np.sin(
                2 * np.pi * (300 + 100 * u)
                * np.arange(n) / 16000)
                + 200 * rng.standard_normal(n)).astype("<i2")
            wav = tmp_path / f"u{u}.wav"
            with wave.open(str(wav), "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes(sig.tobytes())
            phn = tmp_path / f"u{u}.phn"
            phn.write_text("\n".join(seq.split()) + "\n")
            lines.append(f"audio={wav} transcript={phn}")
        recipe = Recipe.read(lines)

        d1 = EStepDriver(model, cfg)
        s1 = d1.run_recipe(recipe)
        d2 = EStepDriver(model, cfg)
        s2 = d2.run_recipe_batched(recipe, batch_size=2)
        from aaltoasr_tpu.train.accumulators import ML_BUF
        # vmapped f32 reductions reorder accumulation: tolerance-level
        np.testing.assert_allclose(
            s2.buffers[ML_BUF].gamma, s1.buffers[ML_BUF].gamma,
            rtol=2e-3, atol=1e-3)
        np.testing.assert_allclose(
            s2.buffers[ML_BUF].mean_acc, s1.buffers[ML_BUF].mean_acc,
            rtol=5e-3, atol=0.05)
        np.testing.assert_allclose(s2.trans_acc, s1.trans_acc,
                                   rtol=2e-3, atol=2e-3)
        assert s2.num_ll == pytest.approx(s1.num_ll, rel=1e-4)


class TestFullStats:
    def test_full_second_moments_and_roundtrip(self, tmp_path):
        """full_stats E-step: diag(full) == diagonal sec_acc, and the
        FULL_STATS gks dump (lower-triangle floats) round-trips."""
        from aaltoasr_tpu.train.driver import (
            EStepDriver, device_stats_to_hmm_stats)
        from aaltoasr_tpu.train.accumulators import (
            HmmStats, ML_BUF, PDF_ML_STATS, PDF_ML_FULL_STATS)
        from aaltoasr_tpu.models.hmm import TransitionTable
        import jax.numpy as jnp
        from aaltoasr_tpu.train import estep
        from aaltoasr_tpu.ops.gmm import GmmScorer
        from aaltoasr_tpu.models.hmm import build_chain, pad_chain

        model = three_state_model(seed=3)
        table = TransitionTable.from_model(model)
        scorer = GmmScorer.from_model(model)
        chain = build_chain(model, table, ["a", "_"])
        g = {k: jnp.asarray(v) for k, v in
             pad_chain(chain, chain.num_positions, fan=4).items()}
        rng = np.random.default_rng(0)
        T = 12
        X = jnp.asarray(rng.normal(0, 1, (T, model.dim)),
                        dtype=jnp.float32)
        out = estep.chain_stats(scorer, X, g, jnp.int32(T),
                                table.num_slots, full_stats=True)
        assert "sec_acc_full" in out
        full = np.asarray(out["sec_acc_full"])
        diag = np.asarray(out["sec_acc"])
        G = model.num_gaussians
        np.testing.assert_allclose(
            np.diagonal(full[:G], axis1=1, axis2=2), diag[:G],
            rtol=1e-4, atol=1e-4)
        # symmetric
        np.testing.assert_allclose(full, np.swapaxes(full, 1, 2),
                                   rtol=1e-5, atol=1e-5)

        mode = PDF_ML_STATS | PDF_ML_FULL_STATS
        st = device_stats_to_hmm_stats(model, table, out, mode)
        st.mode = mode
        st.dump(str(tmp_path / "fs"))
        st2 = HmmStats.zeros(model, table, mode)
        st2.load(str(tmp_path / "fs"), table)
        b1, b2 = st.buffers[ML_BUF], st2.buffers[ML_BUF]
        np.testing.assert_allclose(b2.full_acc[:G], b1.full_acc[:G],
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(b2.gamma, b1.gamma, rtol=1e-6)

    def test_full_cov_mstep(self):
        """estimate_ml updates full covariances from full moments."""
        from aaltoasr_tpu.train.accumulators import (
            HmmStats, ML_BUF, PDF_ML_STATS, PDF_ML_FULL_STATS)
        from aaltoasr_tpu.train.estimate import estimate_ml
        from aaltoasr_tpu.models.hmm import TransitionTable
        rng = np.random.default_rng(5)
        model = three_state_model(seed=5)
        D = model.dim
        # make Gaussian 0 full-covariance
        model.cov_type = "variable"
        model.gauss_kind = (["full"] + ["diag"]
                            * (model.num_gaussians - 1))
        model.full_covars = {0: np.eye(D)}
        table = TransitionTable.from_model(model)
        stats = HmmStats.zeros(model, table,
                               PDF_ML_STATS | PDF_ML_FULL_STATS)
        buf = stats.buffers[ML_BUF]
        # synthetic data: known mean + correlated covariance
        L = rng.normal(0, 0.3, (D, D))
        C_true = L @ L.T + np.eye(D)
        mu_true = rng.normal(0, 1, D)
        n = 500.0
        X = rng.multivariate_normal(mu_true, C_true, int(n))
        buf.gamma[:] = 1e-3
        buf.gamma[0] = n
        buf.mean_acc[0] = X.sum(axis=0)
        buf.sec_acc[0] = (X * X).sum(axis=0)
        buf.ensure_full()
        buf.full_acc[0] = X.T @ X
        for s in range(model.num_states):
            buf.mix_gamma[s, 0] = 1.0
        new = estimate_ml(model, table, stats, minvar=1e-4)
        got = new.full_covars[0]
        want = X.T @ X / n - np.outer(X.mean(0), X.mean(0))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(new.means[0], X.mean(0), rtol=1e-9)


class TestShiftFB:
    """Shift-compiled forward-backward == plain FB (gamma, transitions,
    total) on chains and hmmnet graphs with irregular edges."""

    def _compare(self, padded, T, table, seed):
        import jax.numpy as jnp
        from aaltoasr_tpu.train import estep
        rng = np.random.default_rng(seed)
        P = padded["pdf"].shape[0]
        obs = rng.normal(-3, 1.5, (T, P)).astype(np.float32)
        if "obs_const" in padded:
            obs = obs + np.asarray(padded["obs_const"])[None, :]
        g_plain = {k: jnp.asarray(v) if isinstance(v, np.ndarray) else v
                   for k, v in padded.items()}
        g_shift = {k: jnp.asarray(v) if isinstance(v, np.ndarray) else v
                   for k, v in estep.shift_compile(padded).items()}
        ga, ta, la = estep.masked_forward_backward(
            jnp.asarray(obs), g_plain, jnp.int32(T), table.num_slots)
        gb, tb, lb = estep.masked_forward_backward_shift(
            jnp.asarray(obs), g_shift, jnp.int32(T), table.num_slots)
        assert float(lb) == pytest.approx(float(la), rel=1e-5)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(tb), np.asarray(ta),
                                   rtol=2e-3, atol=2e-4)

    def test_chain_graph(self):
        model = three_state_model(seed=11)
        table = TransitionTable.from_model(model)
        chain = build_chain(model, table, ["a", "_", "a"])
        padded = pad_chain(chain, chain.num_positions + 3, fan=4)
        self._compare(padded, 14, table, seed=12)

    def test_hmmnet_graph_with_irregular_edges(self):
        from aaltoasr_tpu.models.hmmnet import (
            compile_hmmnet, pad_hmmnet, transcript_hmmnet, union_fst)
        model = three_state_model(seed=13)
        table = TransitionTable.from_model(model)
        fst = union_fst(
            transcript_hmmnet(model, table, ["a", "_"]),
            transcript_hmmnet(model, table, ["_", "a"]))
        g, _ = compile_hmmnet(fst, table)
        padded = pad_hmmnet(g, int(g["num_positions"]) + 2, fan=6)
        self._compare(padded, 12, table, seed=14)

    def test_masked_frames_frozen(self):
        import jax.numpy as jnp
        from aaltoasr_tpu.train import estep
        model = three_state_model(seed=15)
        table = TransitionTable.from_model(model)
        chain = build_chain(model, table, ["a"])
        padded = pad_chain(chain, chain.num_positions, fan=4)
        g = {k: jnp.asarray(v) if isinstance(v, np.ndarray) else v
             for k, v in estep.shift_compile(padded).items()}
        rng = np.random.default_rng(16)
        P = padded["pdf"].shape[0]
        obs = rng.normal(-3, 1, (10, P)).astype(np.float32)
        # frames beyond n=6 must not affect results
        ga, ta, la = estep.masked_forward_backward_shift(
            jnp.asarray(obs), g, jnp.int32(6), table.num_slots)
        obs2 = obs.copy()
        obs2[6:] = 99.0
        gb, tb, lb = estep.masked_forward_backward_shift(
            jnp.asarray(obs2), g, jnp.int32(6), table.num_slots)
        assert float(la) == pytest.approx(float(lb))
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   atol=1e-6)


class TestShiftViterbi:
    def test_matches_plain_viterbi(self):
        import jax.numpy as jnp
        from aaltoasr_tpu.models.hmmnet import (
            compile_hmmnet, pad_hmmnet, transcript_hmmnet, union_fst)
        model = three_state_model(seed=21)
        table = TransitionTable.from_model(model)
        fst = union_fst(
            transcript_hmmnet(model, table, ["a", "_"]),
            transcript_hmmnet(model, table, ["_", "a", "a"]))
        g, _ = compile_hmmnet(fst, table)
        padded = pad_hmmnet(g, int(g["num_positions"]) + 2, fan=6)
        shifted = estep.shift_compile(padded)
        rng = np.random.default_rng(22)
        P = padded["pdf"].shape[0]
        for T, seed in ((10, 1), (14, 2), (9, 3)):
            obs = (rng.normal(-3, 1.5, (14, P)).astype(np.float32)
                   + np.asarray(padded["obs_const"])[None, :])
            g1 = {k: jnp.asarray(v) if isinstance(v, np.ndarray) else v
                  for k, v in padded.items()}
            g2 = {k: jnp.asarray(v) if isinstance(v, np.ndarray) else v
                  for k, v in shifted.items()}
            p1, s1 = estep.masked_viterbi(
                jnp.asarray(obs), g1, jnp.int32(T))
            p2, s2 = estep.masked_viterbi_shift(
                jnp.asarray(obs), g2, jnp.int32(T))
            assert float(s2) == pytest.approx(float(s1), rel=1e-5)
            np.testing.assert_array_equal(
                np.asarray(p2)[:T], np.asarray(p1)[:T])
