from .dense_engine import DenseSearchEngine
from .device_engine import DeviceSearchEngine
from .engine import InvertedIndex
from .hybrid_engine import HybridSearchEngine

__all__ = [
    "DenseSearchEngine",
    "DeviceSearchEngine",
    "HybridSearchEngine",
    "InvertedIndex",
]
