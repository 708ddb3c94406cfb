"""ARPA n-gram language model parsing.

Standard ARPA back-off format (reader parity: `decoder/src/ArpaReader.cc`,
`decoder/src/TreeGramArpaReader.cc`): ``\\data\\`` header with
``ngram N=count`` lines, then per-order sections ``\\N-grams:`` of
``logprob w1 ... wN [backoff]`` (log10 domain), ending at ``\\end\\``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

LN10 = 2.302585092994046


@dataclass
class ArpaLM:
    """Parsed ARPA model.  Scores stored in natural log (reference
    TreeGram converts log10 -> ln internally for decoding math)."""

    order: int
    vocab: list                      # index -> word string
    word_index: dict                 # word -> index
    # per order o (1-based): dict mapping tuple(word ids) -> (logp, backoff)
    ngrams: list = field(default_factory=list)

    def log_prob(self, context: tuple, word: int) -> float:
        """Back-off n-gram score ln P(word | context)."""
        ctx = tuple(context)[-(self.order - 1):] if self.order > 1 else ()
        score = 0.0
        while True:
            entry = self.ngrams[len(ctx) + 1].get(ctx + (word,))
            if entry is not None:
                return score + entry[0]
            if not ctx:
                return float("-inf")  # OOV
            score += self.ngrams[len(ctx)].get(ctx, (0.0, 0.0))[1]
            ctx = ctx[1:]


def read_arpa(path_or_text) -> ArpaLM:
    if "\n" in str(path_or_text) or "\\data\\" in str(path_or_text):
        text = path_or_text
    else:
        with open(path_or_text) as f:
            text = f.read()
    lines = iter(text.splitlines())

    # header
    for line in lines:
        if line.strip() == "\\data\\":
            break
    else:
        raise ValueError("ARPA: no \\data\\ header")
    counts = []
    for line in lines:
        line = line.strip()
        if not line:
            continue
        if line.startswith("ngram"):
            counts.append(int(line.split("=")[1]))
        else:
            break
    order = len(counts)

    vocab: list[str] = []
    word_index: dict[str, int] = {}

    def wid(w: str) -> int:
        if w not in word_index:
            word_index[w] = len(vocab)
            vocab.append(w)
        return word_index[w]

    ngrams = [dict() for _ in range(order + 1)]
    cur_order = None
    # `line` currently holds the first section header
    def handle(line):
        nonlocal cur_order
        line = line.strip()
        if not line:
            return
        if line.startswith("\\") and line.endswith("-grams:"):
            cur_order = int(line[1:line.index("-")])
            return
        if line == "\\end\\":
            cur_order = None
            return
        if cur_order is None:
            return
        parts = line.split()
        logp = float(parts[0]) * LN10
        words = tuple(wid(w) for w in parts[1:1 + cur_order])
        bo = 0.0
        if len(parts) > 1 + cur_order:
            bo = float(parts[1 + cur_order]) * LN10
        ngrams[cur_order][words] = (logp, bo)

    handle(line)
    for line in lines:
        handle(line)

    return ArpaLM(order=order, vocab=vocab, word_index=word_index,
                  ngrams=[ngrams[o] for o in range(order + 1)])


def write_arpa(lm: ArpaLM, path) -> None:
    """Write back in ARPA format (bin2arpa parity)."""
    with open(path, "w") as f:
        f.write("\\data\\\n")
        for o in range(1, lm.order + 1):
            f.write(f"ngram {o}={len(lm.ngrams[o])}\n")
        for o in range(1, lm.order + 1):
            f.write(f"\n\\{o}-grams:\n")
            for words, (logp, bo) in sorted(lm.ngrams[o].items()):
                ws = " ".join(lm.vocab[w] for w in words)
                if bo != 0.0:
                    f.write(f"{logp / LN10:.6f} {ws} {bo / LN10:.6f}\n")
                else:
                    f.write(f"{logp / LN10:.6f} {ws}\n")
        f.write("\n\\end\\\n")
