from .debug import Debug
from .knuth import KnuthRandom
from .progress import ProgressReport, TeeStream

__all__ = ["Debug", "KnuthRandom", "ProgressReport", "TeeStream"]
