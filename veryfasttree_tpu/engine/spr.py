"""SPR moves (placeholder -- implemented in a later milestone).

Will re-create findSPRSteps/unwindSPRStep/traverseSPR (ref tcc:1805-1879,
6185-6404): chains of up to maxSPRLength NNIs per node, keeping the best
prefix.
"""
from __future__ import annotations


def run_spr(nj, i_round: int, n_rounds: int) -> None:
    raise NotImplementedError("SPR lands in a later milestone; run with -spr 0")
