"""Top-hits heuristic (placeholder -- implemented in a later milestone).

Will re-create the reference machinery (ref setAllLeafTopHits tcc:3746-4124,
topHitNJSearch :4137-4298, topHitJoin :4306-4533, visible/topvisible
maintenance :4635-4784) with the seed scans as batched device matmuls.
"""
from __future__ import annotations


class TopHits:
    def __init__(self, options, maxnodes: int, m: int):
        raise NotImplementedError("top-hits lands in the next milestone; "
                                  "run with -notop / -slow for now")
