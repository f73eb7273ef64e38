from . import ecapa, mrte

__all__ = ["ecapa", "mrte"]
