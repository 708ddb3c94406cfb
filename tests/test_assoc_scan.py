"""Associative-scan (sequence-parallel) forward pass: equivalence with
the sequential scan + actual time-axis sharding on an 8-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aaltoasr_tpu.models.hmm import TransitionTable, build_chain, pad_chain
from aaltoasr_tpu.ops import chain as chain_ops
from aaltoasr_tpu.ops.gmm import GmmScorer

from tests.test_train import three_state_model


def _setup(T=64, seed=0):
    rng = np.random.default_rng(seed)
    model = three_state_model(seed=seed)
    table = TransitionTable.from_model(model)
    scorer = GmmScorer.from_model(model)
    c = build_chain(model, table, ["_", "a", "a", "_"])
    g = {k: jnp.asarray(v) for k, v in pad_chain(c, 16, fan=4).items()
         if not np.isscalar(v)} | {
        k: v for k, v in pad_chain(c, 16, fan=4).items()
        if np.isscalar(v)}
    feats = rng.normal(0, 2, (T, model.dim)).astype(np.float32)
    sll = np.asarray(scorer.state_log_likelihoods(jnp.asarray(feats)))
    obs_pos = jnp.asarray(sll[:, np.asarray(g["pdf"])])
    return obs_pos, g, table


def test_matches_sequential_forward():
    obs_pos, g, table = _setup()
    gamma, _, total_seq = chain_ops.forward_backward_chain(
        obs_pos, g, table.num_slots)
    alphas, total = chain_ops.forward_assoc_chain(obs_pos, g)
    assert float(total) == pytest.approx(float(total_seq), rel=1e-5)
    # spot-check alphas against a fresh sequential forward
    from aaltoasr_tpu.ops.logsemiring import LOG_ZERO, logsumexp
    in_src, in_logp = g["in_src"], g["in_logp"]
    a = jnp.maximum(obs_pos[0] + chain_ops._entry_vector(
        obs_pos.shape[1], g["num_positions"]), LOG_ZERO)
    for t in range(1, obs_pos.shape[0]):
        a = jnp.maximum(
            logsumexp(a[in_src] + in_logp, axis=1) + obs_pos[t],
            LOG_ZERO)
        live = np.asarray(a) > LOG_ZERO / 2
        np.testing.assert_allclose(np.asarray(alphas[t])[live],
                                   np.asarray(a)[live],
                                   rtol=1e-4, atol=1e-3)


def test_time_sharded_on_mesh():
    """The whole point: obs sharded along TIME across 8 devices, one
    jitted program, collectives compose the prefix tree."""
    obs_pos, g, _ = _setup(T=64)
    trans = chain_ops.dense_transition_matrix(g)
    mesh = Mesh(np.array(jax.devices()[:8]), ("t",))
    sh = NamedSharding(mesh, P("t", None))
    obs_sharded = jax.device_put(obs_pos, sh)

    @jax.jit
    def run(o):
        return chain_ops.forward_assoc_chain(o, g, trans_dense=trans)

    alphas, total = run(obs_sharded)
    _, total_ref = chain_ops.forward_assoc_chain(obs_pos, g,
                                                 trans_dense=trans)
    assert float(total) == pytest.approx(float(total_ref), rel=1e-5)
