"""Class-based LM support (`decoder/src/WordClasses.{hh,cc}`).

Class definition file: ``class_name [probability] word`` per line.  In
decoding, a word's LM identity becomes its class and its in-class
membership log-prob joins the pronunciation score:
P(w | h) = P(class(w) | h) * p(w | class(w)).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field


@dataclass
class WordClasses:
    # word -> (class_name, ln membership prob)
    membership: dict = field(default_factory=dict)

    @classmethod
    def read(cls, path_or_text) -> "WordClasses":
        text = path_or_text
        if "\n" not in str(text):
            with open(text) as f:
                text = f.read()
        out = cls()
        for line in text.splitlines():
            parts = line.split()
            if not parts:
                continue
            if len(parts) == 2:
                class_name, word = parts
                prob = 1.0
            elif len(parts) >= 3:
                class_name = parts[0]
                try:
                    prob = float(parts[1])
                    word = parts[2]
                except ValueError:
                    prob = 1.0
                    word = parts[1]
            else:
                continue
            out.membership[word] = (
                class_name, math.log(prob) if prob > 0 else -1e30)
        return out

    def apply_to_tree(self, tree, lm) -> None:
        """Rewrite the prefix tree in place for class-based decoding:
        lm lookups use the class id; membership log-probs add to the
        pronunciation scores (LM side, like cm_log_prob)."""
        import numpy as np
        # adjust per word-end pron scores
        for n in range(tree.we_word.shape[0]):
            for h in range(tree.we_word.shape[1]):
                w = int(tree.we_word[n, h])
                if w < 0:
                    continue
                word = tree.vocab[w]
                if word in self.membership:
                    _, lp = self.membership[word]
                    tree.we_pron_logp[n, h] += lp

    def lm_word_names(self, vocab) -> list:
        """Per tree-vocab word: the LM symbol to query (class or word)."""
        return [self.membership.get(w, (w, 0.0))[0] for w in vocab]
