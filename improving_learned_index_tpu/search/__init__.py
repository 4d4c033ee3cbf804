from .dense_engine import DenseSearchEngine
from .device_engine import DeviceSearchEngine
from .engine import InvertedIndex
from .hybrid_engine import HybridSearchEngine
from .sharded_engine import ShardedSearchEngine

__all__ = [
    "DenseSearchEngine",
    "DeviceSearchEngine",
    "HybridSearchEngine",
    "ShardedSearchEngine",
    "InvertedIndex",
]
