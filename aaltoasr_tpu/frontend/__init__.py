"""Feature frontend: the .cfg module DAG compiled to one fused JAX function.

The reference generates features frame-by-frame through a pull-based ring
buffer DAG (`aku/FeatureGenerator.cc`, `aku/FeatureModules.cc`).  Here the
whole DAG is planned once and compiled to a single jitted function over
``[num_samples] -> [num_frames, dim]`` (batched over utterances with vmap),
with speaker-dependent runtime parameters passed as a pytree so speaker
switches never retrigger compilation.
"""

from aaltoasr_tpu.frontend.generator import FeatureGenerator

__all__ = ["FeatureGenerator"]
