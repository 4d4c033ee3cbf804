from .deep_impact import DeepImpact, DeepImpactCrossEncoder
from .encoder import (
    CrossEncoderModel,
    DeepImpactModel,
    ImpactHead,
    TransformerEncoder,
    init_params,
)

__all__ = [
    "DeepImpact",
    "DeepImpactCrossEncoder",
    "CrossEncoderModel",
    "DeepImpactModel",
    "ImpactHead",
    "TransformerEncoder",
    "init_params",
]
