"""N-gram LM compiled to a backoff FSA with gather-based device lookup.

Same representation idea as the reference's fsalm (`decoder/src/fsalm/
LM.{hh,cc}`: n-gram compiled to an FSA whose nodes embed backoff arcs,
walked with `walk(node, symbol, &score)`), rebuilt for TPU: transitions
live in one array sorted by packed (state, word) key, looked up by
binary search (a handful of gathers), and backoff hops are unrolled
``order`` times with masking — no data-dependent control flow.

States are the observed n-gram contexts (orders 0..n-1).  A walk from
state ``h`` on word ``w``:

* explicit transition if ``h·w`` is an n-gram: score = ln P(w|h), next
  state = longest suffix of ``h·w`` that is a context;
* otherwise add backoff(h) and retry from suffix(h).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from aaltoasr_tpu.formats.arpa import ArpaLM

NEG_INF = -1.0e30


@dataclass
class NGramFsa:
    order: int
    vocab: list
    word_index: dict
    num_states: int
    context_of_state: list          # state id -> context tuple
    state_of_context: dict          # context tuple -> state id
    trans_word: np.ndarray          # [M] int32, grouped by state, sorted
    trans_prob: np.ndarray          # [M] float32 ln P
    trans_next: np.ndarray          # [M] int32
    state_first: np.ndarray         # [num_states + 1] row offsets into M
    bo_weight: np.ndarray           # [num_states] float32
    bo_next: np.ndarray             # [num_states] int32
    num_words: int

    @classmethod
    def from_arpa(cls, lm: ArpaLM) -> "NGramFsa":
        order = lm.order
        V = len(lm.vocab)
        contexts = {(): 0}
        context_list = [()]

        def intern(ctx):
            if ctx not in contexts:
                contexts[ctx] = len(context_list)
                context_list.append(ctx)
            return contexts[ctx]

        # contexts = all grams of order < n (they can carry history)
        for o in range(1, order):
            for words in lm.ngrams[o]:
                intern(words)

        def next_state(ctx, w):
            """Longest suffix of ctx+(w,) (capped to order-1) that is a
            known context."""
            t = (ctx + (w,))[-(order - 1):] if order > 1 else ()
            while t and t not in contexts:
                t = t[1:]
            return contexts[t]

        keys, probs, nexts = [], [], []
        S = len(context_list)
        for o in range(1, order + 1):
            for words, (logp, _bo) in lm.ngrams[o].items():
                ctx, w = words[:-1], words[-1]
                if ctx not in contexts:
                    continue  # unreachable context (pruned LM)
                s = contexts[ctx]
                keys.append(s * V + w)
                probs.append(logp)
                nexts.append(next_state(ctx, w))

        bo_weight = np.zeros(S, dtype=np.float32)
        bo_next = np.zeros(S, dtype=np.int32)
        for ctx, s in contexts.items():
            if ctx:
                bo_weight[s] = lm.ngrams[len(ctx)].get(ctx, (0.0, 0.0))[1]
                t = ctx[1:]
                while t and t not in contexts:
                    t = t[1:]
                bo_next[s] = contexts[t]
            else:
                bo_weight[s] = NEG_INF  # no backoff from unigram state
                bo_next[s] = 0

        keys = np.asarray(keys, dtype=np.int64)
        srt = np.argsort(keys, kind="stable")
        keys = keys[srt]
        states = (keys // V).astype(np.int64)
        words = (keys % V).astype(np.int32)
        # CSR-style row offsets per state: transitions grouped by state,
        # word-sorted within each group (int32-safe two-level lookup)
        state_first = np.zeros(S + 1, dtype=np.int32)
        np.add.at(state_first, states + 1, 1)
        state_first = np.cumsum(state_first).astype(np.int32)
        return cls(
            order=order, vocab=list(lm.vocab),
            word_index=dict(lm.word_index),
            num_states=S, context_of_state=context_list,
            state_of_context=contexts,
            trans_word=words,
            trans_prob=np.asarray(probs, dtype=np.float32)[srt],
            trans_next=np.asarray(nexts, dtype=np.int32)[srt],
            state_first=state_first,
            bo_weight=bo_weight, bo_next=bo_next, num_words=V)

    # -- host walk (reference for tests / host decoding) ------------------
    def walk(self, state: int, word: int) -> tuple[int, float]:
        score = 0.0
        for _ in range(self.order + 1):
            lo, hi = self.state_first[state], self.state_first[state + 1]
            i = lo + np.searchsorted(self.trans_word[lo:hi], word)
            if i < hi and self.trans_word[i] == word:
                return int(self.trans_next[i]), score + float(
                    self.trans_prob[i])
            if self.bo_weight[state] <= NEG_INF / 2:
                return 0, NEG_INF
            score += float(self.bo_weight[state])
            state = int(self.bo_next[state])
        return 0, NEG_INF

    def initial_state(self, sentence_start: str = "<s>") -> int:
        ctx = (self.word_index[sentence_start],) if (
            sentence_start in self.word_index and self.order > 1) else ()
        while ctx and ctx not in self.state_of_context:
            ctx = ctx[1:]
        return self.state_of_context[ctx]

    # -- device tables ----------------------------------------------------
    def device_tables(self) -> dict:
        max_row = int(np.max(np.diff(self.state_first))) if len(
            self.trans_word) else 1
        return {
            "trans_word": jnp.asarray(self.trans_word),
            "trans_prob": jnp.asarray(self.trans_prob),
            "trans_next": jnp.asarray(self.trans_next),
            "state_first": jnp.asarray(self.state_first),
            "bo_weight": jnp.asarray(self.bo_weight),
            "bo_next": jnp.asarray(self.bo_next),
            "lookup_iters": int(np.ceil(np.log2(max(max_row, 2)))) + 1,
        }


def lm_walk_device(tables: dict, num_words: int, order: int, state, word):
    """Vectorized FSA walk: (state [N], word [N]) -> (next [N], score [N]).

    Two-level lookup: CSR row offsets per state, then a fixed-iteration
    binary search over that state's word-sorted transitions; backoff hops
    are unrolled ``order`` times with masking.  int32 throughout — no
    64-bit keys needed on TPU.
    """
    tw = tables["trans_word"]
    sf = tables["state_first"]
    iters = tables["lookup_iters"]
    M = tw.shape[0]

    def lookup(state, word):
        lo = sf[state]
        hi = sf[state + 1]
        for _ in range(iters):
            mid = (lo + hi) // 2
            v = tw[jnp.minimum(mid, M - 1)]
            go_right = (v < word) & (mid < hi)
            lo = jnp.where(go_right, mid + 1, lo)
            hi = jnp.where(go_right, hi, mid)
        idx = jnp.minimum(lo, M - 1)
        hit = (lo < sf[state + 1]) & (tw[idx] == word)
        return hit, idx

    score = jnp.zeros(state.shape, jnp.float32)
    next_state = jnp.zeros(state.shape, jnp.int32)
    done = jnp.zeros(state.shape, bool)
    for _ in range(order + 1):
        hit, idx = lookup(state, word)
        take = hit & ~done
        next_state = jnp.where(take, tables["trans_next"][idx], next_state)
        score = jnp.where(take, score + tables["trans_prob"][idx], score)
        done = done | hit
        bo = tables["bo_weight"][state]
        dead = ~done & (bo <= NEG_INF / 2)
        score = jnp.where(dead, NEG_INF, score)
        done = done | dead
        score = jnp.where(done, score, score + bo)
        state = jnp.where(done, state, tables["bo_next"][state])
    return next_state, score
