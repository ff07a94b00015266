"""Data layer: dataset configs, host-side loaders, synthetic scenes."""
from .config import ScannetConfig, SunrgbdConfig, get_config

__all__ = ["ScannetConfig", "SunrgbdConfig", "get_config"]
