from . import losses, negatives, walks

__all__ = ["losses", "negatives", "walks"]
