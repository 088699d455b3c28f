from tpubq.utils import health, options, profiling

__all__ = ["health", "options", "profiling"]
