from .dense_engine import DenseSearchEngine
from .device_engine import DeviceSearchEngine
from .engine import InvertedIndex

__all__ = ["DenseSearchEngine", "DeviceSearchEngine", "InvertedIndex"]
