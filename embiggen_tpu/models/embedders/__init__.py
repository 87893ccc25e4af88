from .walk_based import CBOW, DeepWalkCBOW, DeepWalkSkipGram, SkipGram, WalkBasedEmbedder
from .line import FirstOrderLINE, SecondOrderLINE
from .siamese import SiameseEmbedder, StructuredEmbedding, TransE, TransH, Unstructured
from .factorization import (
    FACTORIZATION_MODELS,
    MNMF,
    NMFADMM,
    NNSED,
    BoostNE,
    GraRep,
    NetMF,
    NodeSketch,
    RandNE,
    Role2Vec,
)
from .glove import DeepWalkGloVe, GloVe
from .kge import (
    KGE_MODELS,
    AutoSF,
    BoxE,
    ComplEx,
    ConvE,
    CrossE,
    DistMA,
    DistMult,
    ERMLP,
    ERMLPE,
    HolE,
    KGEModel,
    NodePiece,
    PairRE,
    ProjE,
    QuatE,
    RESCAL,
    RotatE,
    TorusE,
    TransD,
    TransF,
    TransR,
    TuckER,
)
from .walklets import WalkletsCBOW, WalkletsGloVe, WalkletsSkipGram
from .spine import (
    RUBICONE,
    RUINE,
    DegreeSPINE,
    DegreeWINE,
    NodeLabelSPINE,
    NodeLabelWINE,
    ScoreSPINE,
    ScoreWINE,
    WeightedSPINE,
)
from .spectral import (
    HOPE,
    GeometricLaplacianEigenmaps,
    LaplacianEigenmaps,
    SocioDim,
)

__all__ = [
    "WalkBasedEmbedder", "SkipGram", "CBOW", "DeepWalkSkipGram", "DeepWalkCBOW",
    "FirstOrderLINE", "SecondOrderLINE",
    "SiameseEmbedder", "TransE", "TransH", "Unstructured", "StructuredEmbedding",
    "GloVe", "DeepWalkGloVe",
    "WalkletsSkipGram", "WalkletsCBOW", "WalkletsGloVe",
    "DegreeSPINE", "DegreeWINE", "NodeLabelSPINE", "NodeLabelWINE",
    "ScoreSPINE", "ScoreWINE", "WeightedSPINE", "RUBICONE", "RUINE",
    "HOPE", "LaplacianEigenmaps", "GeometricLaplacianEigenmaps", "SocioDim",
]
