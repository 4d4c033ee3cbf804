from .quantize import (
    global_max,
    quantize_array,
    quantize_device,
    quantize_scale,
    quantize_value,
)

__all__ = [
    "global_max",
    "quantize_array",
    "quantize_device",
    "quantize_scale",
    "quantize_value",
]
