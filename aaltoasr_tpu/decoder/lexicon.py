"""Lexicon reading and the flattened HMM-state prefix tree.

Reference: `decoder/src/TPNowayLexReader.cc` (format: ``word(prob) ph1
ph2 ...`` per line, '_' = silence) and `decoder/src/TPLexPrefixTree.
{hh,cc}` (pointer-based tree of HMM-state nodes with cross-word
fan-in/fan-out networks).  This build is TPU-first: the tree is compiled
into dense SoA arrays the batched beam search consumes directly —

* per node: emission pdf, duration-state id, dense out-arc table
  ``[N, A]`` (in-word arcs: self-loops, forward/skip transitions, phone-
  trie branch arcs), and up to H word-end slots (word id, pronunciation
  ln-prob, exit ln-prob) for homophone ends;
* root arcs ``[R]``: entries into every first phone state (the epsilon
  closure of word-end -> root -> first states, so the device search needs
  exactly one in-word expansion + one word-end expansion per frame).

This round builds the monophone tree; cross-word triphone fan-in/fan-out
(`TPLexPrefixTree.hh:172-240`) is a planned extension of the same arrays.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from aaltoasr_tpu.formats.model_io import HmmModel
from aaltoasr_tpu.ops.logsemiring import LOG_ZERO


@dataclass
class LexiconEntry:
    word: str
    phones: list
    prob: float = 1.0


def read_lexicon(path_or_text) -> list:
    """Parse a NOWAY lexicon: ``word(prob) phone ...`` per line."""
    if "\n" in str(path_or_text):
        text = path_or_text
    else:
        with open(path_or_text) as f:
            text = f.read()
    entries = []
    for line in text.splitlines():
        parts = line.split()
        if not parts:
            continue
        word = parts[0]
        prob = 1.0
        if "(" in word:
            left = word.rfind("(")
            right = word.rfind(")")
            if left < 0 or right < 0:
                raise ValueError(f"invalid probability in {word!r}")
            prob = float(word[left + 1:right])
            word = word[:left]
        entries.append(LexiconEntry(word=word, phones=parts[1:], prob=prob))
    return entries


@dataclass
class PrefixTree:
    """Flattened monophone lexical prefix tree."""

    num_nodes: int
    vocab: list                    # word id -> string
    word_index: dict
    pdf: np.ndarray                # [N] emission pdf per node
    dur_state: np.ndarray          # [N] tied state for duration model
    arc_tgt: np.ndarray            # [N, A] in-word arcs (self-pad)
    arc_logp: np.ndarray           # [N, A] (LOG_ZERO pad)
    we_word: np.ndarray            # [N, H] word ids ending here (-1 pad)
    we_exit_logp: np.ndarray       # [N, H] exit transition ln-prob (AM side)
    we_pron_logp: np.ndarray       # [N, H] pronunciation ln-prob (LM side,
                                   #        cm_log_prob in the reference)
    we_skip_lm: np.ndarray         # [N, H] bool: no LM score (silence)
    root_tgt: np.ndarray           # [R] entry nodes
    root_logp: np.ndarray          # [R]
    silence_word: int = -1


def expand_context_phones(phones: list, phone_map: dict,
                          boundary: str = "_") -> list:
    """Map a word's phone sequence to context-dependent model labels.

    For tied-triphone models (labels like ``l-c+r`` from decision-tree
    tying) each within-word phone resolves with fallbacks: full triphone
    -> left biphone -> right biphone -> monophone.  Word boundaries use
    the ``boundary`` context (cross-word fan-in/fan-out networks,
    `TPLexPrefixTree.hh:172-240`, are a planned extension).  Monophone
    lexicons pass through unchanged.
    """
    out = []
    n = len(phones)
    for i, p in enumerate(phones):
        left = phones[i - 1] if i > 0 else boundary
        right = phones[i + 1] if i + 1 < n else boundary
        for cand in (f"{left}-{p}+{right}", f"{left}-{p}", f"{p}+{right}",
                     p):
            if cand in phone_map:
                out.append(cand)
                break
        else:
            out.append(p)  # unknown; caller reports it
    return out


def build_prefix_tree(model: HmmModel, entries: list,
                      silence_is_word: bool = True,
                      use_context_phones: bool | None = None) -> PrefixTree:
    """Compile lexicon entries against the acoustic model's phones.

    use_context_phones: expand lexicon monophone strings to the model's
    tied context-dependent labels (auto-detected from the model's phone
    inventory by default).
    """
    phone_map = {p.label: p for p in model.phones}
    if use_context_phones is None:
        use_context_phones = any(
            ("-" in lbl or "+" in lbl) for lbl in phone_map)
    if use_context_phones:
        entries = [
            LexiconEntry(word=e.word,
                         phones=expand_context_phones(e.phones, phone_map),
                         prob=e.prob)
            for e in entries]

    vocab: list[str] = []
    word_index: dict[str, int] = {}

    def wid(w: str) -> int:
        if w not in word_index:
            word_index[w] = len(vocab)
            vocab.append(w)
        return word_index[w]

    # trie over phone sequences; trie node = phone instance
    # phone instance -> its emitting node range
    pdf: list[int] = []
    dur_state: list[int] = []
    arcs: list[list] = []          # per node: [(tgt, logp)]
    we: list[list] = []            # per node: [(word, logp, skip_lm)]

    def new_node(pdf_id: int) -> int:
        pdf.append(pdf_id)
        dur_state.append(pdf_id)
        arcs.append([])
        we.append([])
        return len(pdf) - 1

    def log(p: float) -> float:
        return math.log(p) if p > 0 else LOG_ZERO

    # trie: key = tuple of phone labels -> (first_node, entry logp slots)
    # each phone instance: nodes for its states; in-phone transitions per
    # the model topology; exits collected for chaining.
    class PhoneInstance:
        def __init__(self, label):
            phone = phone_map[label]
            self.label = label
            self.nodes = [new_node(s) for s in phone.states]
            self.exits = []  # (node, logp) pairs leaving the phone
            k = len(phone.states)
            for i, s in enumerate(phone.states):
                for off, prob in model.transitions.get(s, []):
                    lp = log(prob)
                    if i + off < k:
                        arcs[self.nodes[i]].append(
                            (self.nodes[i + off], lp))
                    elif i + off == k:
                        self.exits.append((self.nodes[i], lp))
            self.children: dict[str, PhoneInstance] = {}

    root_children: dict[str, PhoneInstance] = {}

    for e in entries:
        if not e.phones:
            continue
        if any(ph not in phone_map for ph in e.phones):
            import sys
            missing = [ph for ph in e.phones if ph not in phone_map][0]
            print(f"build_prefix_tree: unknown hmm {missing} in word "
                  f"'{e.word}'", file=sys.stderr)
            continue
        level = root_children
        inst = None
        for ph in e.phones:
            if ph not in level:
                child = PhoneInstance(ph)
                if inst is not None:
                    for (n, lp) in inst.exits:
                        arcs[n].append((child.nodes[0], lp))
                level[ph] = child
            inst = level[ph]
            level = inst.children
        # word end on the final states of the last phone.  '_' (silence)
        # is never a vocabulary word (TPNowayLexReader.cc:154-160): it
        # carries no LM score, no insertion penalty and no output.
        is_silence = e.word == "_"
        w = -1 if is_silence else wid(e.word)
        for (n, lp) in inst.exits:
            we[n].append((w, lp, log(e.prob), is_silence))

    root_tgt = [c.nodes[0] for c in root_children.values()]
    root_logp = [0.0] * len(root_tgt)
    silence_word = -1

    N = len(pdf)
    A = max((len(a) for a in arcs), default=1)
    H = max((len(h) for h in we), default=1)
    arc_tgt = np.tile(np.arange(N, dtype=np.int32)[:, None], (1, A))
    arc_logp = np.full((N, A), LOG_ZERO, dtype=np.float32)
    we_word = np.full((N, H), -1, dtype=np.int32)
    we_exit = np.full((N, H), LOG_ZERO, dtype=np.float32)
    we_pron = np.zeros((N, H), dtype=np.float32)
    we_skip = np.zeros((N, H), dtype=bool)
    for n in range(N):
        for a, (tgt, lp) in enumerate(arcs[n]):
            arc_tgt[n, a] = tgt
            arc_logp[n, a] = lp
        for h, (w, lp, pron, skip) in enumerate(we[n]):
            we_word[n, h] = w
            we_exit[n, h] = lp
            we_pron[n, h] = pron
            we_skip[n, h] = skip

    return PrefixTree(
        num_nodes=N, vocab=vocab, word_index=word_index,
        pdf=np.asarray(pdf, dtype=np.int32),
        dur_state=np.asarray(dur_state, dtype=np.int32),
        arc_tgt=arc_tgt, arc_logp=arc_logp,
        we_word=we_word, we_exit_logp=we_exit, we_pron_logp=we_pron,
        we_skip_lm=we_skip,
        root_tgt=np.asarray(root_tgt, dtype=np.int32),
        root_logp=np.asarray(root_logp, dtype=np.float32),
        silence_word=silence_word)


def duration_table(model: HmmModel, max_dur: int = 64,
                   scale: float = 1.0) -> np.ndarray:
    """[S, max_dur] gamma duration log-probs; row zero if no model.

    log p(d) = (a-1) ln d - d/b - a ln b - lgamma(a)
    (`decoder/src/Hmm.cc:16-39`).  Index d-1 holds duration d.
    """
    S = model.num_states
    out = np.zeros((S, max_dur), dtype=np.float32)
    if model.durations is None:
        return out
    for s in range(S):
        a, b = model.durations[s]
        if a > 0 and b > 0:
            d = np.arange(1, max_dur + 1, dtype=np.float64)
            out[s] = ((a - 1) * np.log(d) - d / b
                      - a * np.log(b) - math.lgamma(a)) * scale
    return out
