from tpubq.utils import health, io, options, profiling

__all__ = ["health", "io", "options", "profiling"]
