#!/usr/bin/env python3
"""Per-stage wall profile of the ML phase on the live backend.

Wraps the stage functions with timers (fetch-inclusive), runs the full
run_ml_phase twice (cold incl. compiles, then warm), and prints a JSON
breakdown.  Usage: python scripts/profile_ml.py [N] [P]
"""
import io
import json
import math
import os
import sys
import time
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench_e2e import synth_codes, warm_d2h  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 250
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 500

    import jax
    from veryfasttree_tpu.engine import batched, ml as ml_mod
    from veryfasttree_tpu.engine.ml_profiles import MLProfiles
    from veryfasttree_tpu.engine.nj import NeighbourJoining
    from veryfasttree_tpu.options import Options
    from veryfasttree_tpu.pipeline import _enable_compilation_cache
    from veryfasttree_tpu.utils.progress import ProgressReport

    _enable_compilation_cache()
    print(f"# d2h open: {warm_d2h():.1f}s", file=sys.stderr)
    codes = synth_codes(n, p)
    threads = 8 if jax.default_backend() != "cpu" else 1

    tally = defaultdict(float)
    calls = defaultdict(int)

    def wrap(mod, name, label=None):
        fn = getattr(mod, name)
        lbl = label or name

        def wrapped(*a, **kw):
            t0 = time.perf_counter()
            out = fn(*a, **kw)
            tally[lbl] += time.perf_counter() - t0
            calls[lbl] += 1
            return out
        setattr(mod, name, wrapped)
        return fn

    orig = {}
    orig["up"] = wrap(batched, "compute_up_profiles_levelwise", "up_profiles")
    orig["nni"] = wrap(batched, "do_nni_batched")
    orig["opt"] = wrap(batched, "optimize_all_branch_lengths_batched", "opt_lengths")
    orig["tll"] = wrap(ml_mod, "tree_loglk")
    orig["rates"] = wrap(ml_mod, "set_ml_rates")
    orig["splits"] = wrap(batched, "test_splits_ml_batched", "test_splits")
    orig["splits2"] = wrap(ml_mod, "test_splits_ml", "test_splits_serial")
    import veryfasttree_tpu.engine.ml_profiles as mlp_mod
    orig["mlctor"] = wrap(mlp_mod.MLProfiles, "__init__", "ml_store_init")
    # also wrap the quartet dispatch + recompute inside MLProfiles
    qfn = MLProfiles.quartet_nni_rows
    rfn = MLProfiles.recompute_ml_profiles

    def qwrap(self, *a, **kw):
        t0 = time.perf_counter()
        out = qfn(self, *a, **kw)
        tally["quartet_nni_rows"] += time.perf_counter() - t0
        calls["quartet_nni_rows"] += 1
        return out

    def rwrap(self, *a, **kw):
        t0 = time.perf_counter()
        out = rfn(self, *a, **kw)
        tally["recompute_ml_profiles"] += time.perf_counter() - t0
        calls["recompute_ml_profiles"] += 1
        return out

    MLProfiles.quartet_nni_rows = qwrap
    MLProfiles.recompute_ml_profiles = rwrap

    def one_phase():
        tally.clear()
        calls.clear()
        opts = Options(n_codes=4, show_progress=False, threads=threads)
        opts.derive_settings()
        nj = NeighbourJoining(opts, codes, None, None)
        nj.fast_nj()
        from veryfasttree_tpu.engine import rearrange
        rearrange.update_branch_lengths(nj)
        rounds = int(0.5 + 2.0 * math.log2(n))
        progress = ProgressReport(False, 0, False)
        t0 = time.perf_counter()
        ml_mod.run_ml_phase(nj, rounds, n, progress, io.StringIO())
        wall = time.perf_counter() - t0
        return rounds, wall

    rounds, cold = one_phase()
    cold_t = {k: round(v, 2) for k, v in sorted(tally.items(),
                                                key=lambda x: -x[1])}
    cold_c = dict(calls)
    rounds, warm = one_phase()
    warm_t = {k: round(v, 2) for k, v in sorted(tally.items(),
                                                key=lambda x: -x[1])}
    warm_c = dict(calls)
    print(json.dumps({
        "n": n, "p": p, "rounds": rounds,
        "cold_wall_s": round(cold, 2), "warm_wall_s": round(warm, 2),
        "warm_stage_s": warm_t, "warm_calls": warm_c,
        "cold_stage_s": cold_t, "cold_calls": cold_c,
    }, indent=1))


if __name__ == "__main__":
    main()
