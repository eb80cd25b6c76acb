#!/usr/bin/env python3
"""Instrument blocking device dispatches per NJ join (the axon-tunnel latency
budget).  Monkeypatches the MEProfiles device-call layer with counters, runs
fast_nj on a synthetic alignment, and prints calls/join per method.

Usage: python scripts/count_dispatches.py [N] [P] [--ml]
"""
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import numpy as np


def synth_codes(n, p, seed=0, n_codes=4):
    rng = np.random.default_rng(seed)
    # correlated sequences: mutate from a founder set so top-hits behaves
    # like real data rather than uniform noise
    n_founders = max(4, n // 20)
    founders = rng.integers(0, n_codes, size=(n_founders, p))
    rows = founders[rng.integers(0, n_founders, size=n)]
    mut = rng.random((n, p)) < 0.1
    rows = np.where(mut, rng.integers(0, n_codes, size=(n, p)), rows)
    return rows.astype(np.int8)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 300

    from veryfasttree_tpu.engine.nj import NeighbourJoining
    from veryfasttree_tpu.engine import profiles as prof_mod
    from veryfasttree_tpu.options import Options

    counts = Counter()
    DEVICE_CALLS = ["dist_one_vs_all", "dist_one_vs_set", "dist_pairs",
                    "dist_pieces_pairs", "refresh_and_pairs", "dist_set_vs_out",
                    "join", "set_from_average", "average_rows_batch",
                    "recompute_outprofile", "row_query"]
    for name in DEVICE_CALLS:
        orig = getattr(prof_mod.MEProfiles, name)

        def wrap(self, *a, _orig=orig, _name=name, **kw):
            counts[_name] += 1
            return _orig(self, *a, **kw)

        setattr(prof_mod.MEProfiles, name, wrap)

    import veryfasttree_tpu.engine.fused as fused_mod
    orig_join = fused_mod.join_step

    def wrap_join(*a, **kw):
        counts["fused_join_step"] += 1
        return orig_join(*a, **kw)
    fused_mod.join_step = wrap_join

    # snapshot the counters when top-hits init finishes, so the join loop's
    # steady-state rate is reported separately from the one-time init cost
    from veryfasttree_tpu.engine import tophits as th_mod
    init_counts = Counter()
    orig_init = th_mod.TopHits.set_all_leaf_tophits

    def wrap_init(self, nj, _orig=orig_init):
        out = _orig(self, nj)
        init_counts.update(counts)
        counts.clear()
        return out
    th_mod.TopHits.set_all_leaf_tophits = wrap_init

    opts = Options()
    opts.n_codes = 4
    opts.use_matrix = False
    opts.ml_nni = 0
    opts.n_bootstrap = 0
    opts.two_tier_min = -1
    opts.derive_settings()
    codes = synth_codes(n, p)

    nj = NeighbourJoining(opts, codes, None, None)
    counts.clear()  # only count the join loop
    import time
    t0 = time.perf_counter()
    nj.fast_nj()
    dt = time.perf_counter() - t0

    joins = n - 3
    total = sum(counts.values())
    print(f"N={n} P={p}: tophits init = {sum(init_counts.values())} dispatches")
    print(f"join loop: {joins} joins, {total} device dispatches "
          f"({total / joins:.2f}/join), {dt:.1f}s total")
    for name, c in counts.most_common():
        print(f"  {name:24s} {c:7d}  {c / joins:.3f}/join")


if __name__ == "__main__":
    main()
