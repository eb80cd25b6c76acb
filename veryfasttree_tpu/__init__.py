"""VeryFastTree-TPU: a TPU-native phylogenetic inference framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
citiususc/veryfasttree (approximately-maximum-likelihood trees from large
multiple-sequence alignments via profile neighbor-joining + NNI/SPR + ML).
"""
from . import constants
from .options import Options

__version__ = constants.VERSION

__all__ = ["Options", "constants"]
