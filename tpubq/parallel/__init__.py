from tpubq.parallel import mesh, sharded

__all__ = ["mesh", "sharded"]
