from .walk_based import CBOW, DeepWalkCBOW, DeepWalkSkipGram, SkipGram, WalkBasedEmbedder

__all__ = [
    "WalkBasedEmbedder", "SkipGram", "CBOW", "DeepWalkSkipGram", "DeepWalkCBOW",
]
