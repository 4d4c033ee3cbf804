from .device_engine import DeviceSearchEngine
from .engine import InvertedIndex

__all__ = ["DeviceSearchEngine", "InvertedIndex"]
