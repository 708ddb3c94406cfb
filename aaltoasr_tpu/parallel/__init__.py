"""Mesh/sharding helpers and the SPMD training step."""

from aaltoasr_tpu.parallel.mesh import (
    make_mesh, sharded_train_step, replicate)

__all__ = ["make_mesh", "sharded_train_step", "replicate"]
