from .nj import Besthit, NeighbourJoining
from .state import TreeState

__all__ = ["Besthit", "NeighbourJoining", "TreeState"]
