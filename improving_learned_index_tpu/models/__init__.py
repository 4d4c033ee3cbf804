from .deep_impact import DeepImpact, DeepImpactCrossEncoder
from .encoder import (
    CrossEncoderModel,
    DeepImpactModel,
    ImpactHead,
    TransformerEncoder,
    init_params,
)
from .factory import (
    DeepImpactXLMR,
    deep_impact,
    deep_impact_cross_encoder,
    deep_impact_phobert,
    deep_impact_xlmr,
    deep_pairwise_impact,
)
from .pairwise import DeepPairwiseImpact
from .quantization import dequantize_params, quantize_params_int4, quantize_params_int8

__all__ = [
    "DeepImpact",
    "DeepImpactCrossEncoder",
    "DeepImpactXLMR",
    "DeepPairwiseImpact",
    "CrossEncoderModel",
    "DeepImpactModel",
    "ImpactHead",
    "TransformerEncoder",
    "init_params",
    "deep_impact",
    "deep_impact_cross_encoder",
    "deep_impact_phobert",
    "deep_impact_xlmr",
    "deep_pairwise_impact",
    "quantize_params_int8",
    "quantize_params_int4",
    "dequantize_params",
]
