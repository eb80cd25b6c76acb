from .distance_matrix import DistanceMatrix
from .transition_matrix import TransitionMatrix

__all__ = ["DistanceMatrix", "TransitionMatrix"]
