"""Decoding engine: lexical prefix tree, n-gram LMs, batched beam search."""
