"""Core array ops: GMM scoring, log-semiring primitives, scan kernels."""
