from .exact_topk import exact_topk_integer
from .quantize import (
    global_max,
    quantize_array,
    quantize_device,
    quantize_scale,
    quantize_value,
)

__all__ = [
    "exact_topk_integer",
    "global_max",
    "quantize_array",
    "quantize_device",
    "quantize_scale",
    "quantize_value",
]
