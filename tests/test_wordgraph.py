"""Word graph / SLF / n-best tests."""

import io

import numpy as np
import pytest

from aaltoasr_tpu.decoder.search import BeamSearch, SearchConfig

from tests.test_decoder import make_decode_task, synth_obs


class TestWordGraph:
    def _decode(self):
        model, tree, fsa = make_decode_task()
        obs = synth_obs(tree, model, ["_", "a", "b", "b", "a", "_"])
        bs = BeamSearch(tree, fsa, model,
                        SearchConfig(num_tokens=128, num_records=16,
                                     beam=1e9, lm_scale=1.0))
        return bs.decode(obs)

    def test_nbest_first_is_one_best(self):
        res = self._decode()
        g = res.word_graph()
        nb = g.nbest(5)
        assert nb, "empty n-best"
        assert nb[0][0] == res.words
        assert nb[0][1] == pytest.approx(res.log_prob, rel=1e-4)
        # scores non-increasing, sequences distinct
        scores = [s for _, s in nb]
        assert scores == sorted(scores, reverse=True)
        seqs = [tuple(w) for w, _ in nb]
        assert len(set(seqs)) == len(seqs)

    def test_slf_format(self):
        res = self._decode()
        g = res.word_graph()
        buf = io.StringIO()
        g.write_slf(buf)
        text = buf.getvalue()
        lines = text.splitlines()
        assert lines[0] == "VERSION=1.1"
        assert lines[1] == "base=10"
        assert lines[2] == "dir=f"
        assert lines[3].startswith("lmscale=")
        assert lines[4].startswith("N=")
        n_decl = int(lines[4].split("\t")[0].split("=")[1])
        l_decl = int(lines[4].split("\t")[1].split("=")[1])
        node_lines = [l for l in lines if l.startswith("I=")]
        link_lines = [l for l in lines if l.startswith("J=")]
        assert len(node_lines) == n_decl
        assert len(link_lines) == l_decl
        # every link references declared nodes
        for l in link_lines:
            fields = dict(kv.split("=", 1) for kv in l.split("\t"))
            assert int(fields["S"]) < n_decl
            assert int(fields["E"]) < n_decl
            assert "W" in fields and "a" in fields and "l" in fields

    def test_lattice_scores_sum_to_total(self):
        # the 1-best path through the lattice reproduces the decode score
        res = self._decode()
        g = res.word_graph()
        nb = g.nbest(1)
        assert nb[0][1] == pytest.approx(res.log_prob, rel=1e-4)


class TestConfidence:
    def test_arc_posteriors_sum(self):
        from aaltoasr_tpu.decoder.wordgraph import arc_posteriors
        model, tree, fsa = make_decode_task()
        obs = synth_obs(tree, model, ["_", "a", "b", "b", "a", "_"])
        bs = BeamSearch(tree, fsa, model,
                        SearchConfig(num_tokens=128, num_records=16,
                                     beam=1e9, lm_scale=1.0))
        g = bs.decode(obs).word_graph()
        post = arc_posteriors(g)
        assert all(0.0 <= p <= 1.0 + 1e-6 for p in post)
        assert max(post) > 0.5  # the 1-best path arcs dominate

    def test_confusion_network_confidences(self):
        from aaltoasr_tpu.decoder.wordgraph import confusion_network
        model, tree, fsa = make_decode_task()
        obs = synth_obs(tree, model, ["_", "a", "b", "b", "a", "_"])
        bs = BeamSearch(tree, fsa, model,
                        SearchConfig(num_tokens=128, num_records=16,
                                     beam=1e9, lm_scale=1.0))
        res = bs.decode(obs)
        cn = confusion_network(res.word_graph())
        assert [w for w, _, _ in cn] == res.words
        for w, conf, alts in cn:
            assert 0.0 <= conf <= 1.0
            assert w in alts
        # clear acoustics: high confidence
        assert all(conf > 0.5 for _, conf, _ in cn)
