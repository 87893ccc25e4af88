from .walk_based import CBOW, DeepWalkCBOW, DeepWalkSkipGram, SkipGram, WalkBasedEmbedder
from .line import FirstOrderLINE, SecondOrderLINE
from .siamese import SiameseEmbedder, StructuredEmbedding, TransE, TransH, Unstructured

__all__ = [
    "WalkBasedEmbedder", "SkipGram", "CBOW", "DeepWalkSkipGram", "DeepWalkCBOW",
    "FirstOrderLINE", "SecondOrderLINE",
    "SiameseEmbedder", "TransE", "TransH", "Unstructured", "StructuredEmbedding",
]
