from .config import ConfigLoader
from .logging_setup import setup_logging
from .profiling import device_timer, timed, capture_trace

__all__ = ["ConfigLoader", "setup_logging", "device_timer", "timed", "capture_trace"]
