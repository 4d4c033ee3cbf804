from .config import (
    EncoderConfig,
    GenerationConfig,
    IndexConfig,
    MeshConfig,
    SearchConfig,
    TrainConfig,
)
from .logging import get_logger

__all__ = [
    "EncoderConfig",
    "GenerationConfig",
    "IndexConfig",
    "MeshConfig",
    "SearchConfig",
    "TrainConfig",
    "get_logger",
]
