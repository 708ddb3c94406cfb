"""Acoustic model state and end-to-end scoring pipelines."""

from aaltoasr_tpu.models.phone_probs import PhoneProbs

__all__ = ["PhoneProbs"]
