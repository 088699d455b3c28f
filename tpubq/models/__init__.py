from tpubq.models import bq, gp

__all__ = ["bq", "gp"]
