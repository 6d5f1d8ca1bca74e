"""Model zoo: v1 StackGAN modules, text encoders, v2 VQGAN + CLIP."""

from imagegenerator_tpu.models.con_augment import ConditioningAugmentation
from imagegenerator_tpu.models.stackgan import (
    StageIGenerator,
    StageIDiscriminator,
    StageIIGenerator,
    StageIIDiscriminator,
    ResidualBlock,
)
from imagegenerator_tpu.models.text_lstm import TextEmbeddingLSTM

__all__ = [
    "ConditioningAugmentation",
    "StageIGenerator",
    "StageIDiscriminator",
    "StageIIGenerator",
    "StageIIDiscriminator",
    "ResidualBlock",
    "TextEmbeddingLSTM",
]
