"""Host-side parsers and writers for AaltoASR interchange formats.

Every format here is bidirectionally compatible with the reference
(`/root/reference/aku/doc/fileformats.html`): models, features configs,
transcriptions, recipes, LNA probability files, speaker configs, ARPA LMs.
"""

from aaltoasr_tpu.formats.feaconf import ModuleConfig, FeatureConfig
from aaltoasr_tpu.formats.model_io import HmmModel, read_model, write_model
from aaltoasr_tpu.formats.phn import PhnEntry, read_phn, write_phn
from aaltoasr_tpu.formats.recipe import Recipe, RecipeInfo
from aaltoasr_tpu.formats.lna import read_lna, write_lna, LNA_2BYTE_SCALE

__all__ = [
    "ModuleConfig", "FeatureConfig",
    "HmmModel", "read_model", "write_model",
    "PhnEntry", "read_phn", "write_phn",
    "Recipe", "RecipeInfo",
    "read_lna", "write_lna", "LNA_2BYTE_SCALE",
]
