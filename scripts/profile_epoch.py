#!/usr/bin/env python3
"""Decompose where NJ wall-clock goes on the live backend.

Phases timed separately:
  warm_d2h     first device->host fetch (axon channel setup, 30-300 s once)
  store_init   NeighbourJoining ctor (profiles, outprofile, leaf out-dists)
  tophits      set_all_leaf_tophits + reset_top_visible (wave seed scans)
  epoch_total  run_epoch wall (compile + device run + host sync)
  epoch_run    second run_epoch on a FRESH engine, same shapes (cache-warm)

Usage: python scripts/profile_epoch.py [N ...]  (default 500 1000 2000)
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_one(n, p=500):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench_e2e import synth_codes
    from veryfasttree_tpu.engine import epoch as epoch_mod
    from veryfasttree_tpu.engine.nj import NeighbourJoining
    from veryfasttree_tpu.options import Options

    codes = synth_codes(n, p)
    opts = Options(n_codes=4, show_progress=False)
    opts.derive_settings()

    t = {}

    def build():
        nj = NeighbourJoining(opts, codes, None, None)
        import math
        from veryfasttree_tpu.engine.tophits import TopHits
        m = int(0.5 + opts.tophits_mult * math.sqrt(nj.n_seqs))
        th = TopHits(opts, nj.maxnodes, m)
        th.set_all_leaf_tophits(nj)
        th.reset_top_visible(nj, nj.n_seqs)
        return nj, th

    t0 = time.perf_counter()
    nj, th = build()
    t["store+tophits"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    epoch_mod.run_epoch(nj, th)
    t["epoch_total"] = time.perf_counter() - t0

    # fresh engine, same shapes: compile is cached, run time is the truth
    t0 = time.perf_counter()
    nj2, th2 = build()
    t["rebuild"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    epoch_mod.run_epoch(nj2, th2)
    t["epoch_warm"] = time.perf_counter() - t0

    joins = n - 3
    print(f"N={n} P={p}: " + "  ".join(f"{k}={v:.2f}s" for k, v in t.items())
          + f"  warm_ms_per_join={1000*t['epoch_warm']/joins:.2f}"
          + f"  warm_joins_per_s={joins/t['epoch_warm']:.1f}", flush=True)
    assert len(nj2.join_log) == joins


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from veryfasttree_tpu.pipeline import _enable_compilation_cache

    _enable_compilation_cache()
    jax.config.update("jax_default_matmul_precision", "highest")
    print(f"backend={jax.default_backend()}", flush=True)
    t0 = time.perf_counter()
    np.asarray(jnp.zeros(8) + 1)  # d2h channel warm-up
    print(f"warm_d2h={time.perf_counter()-t0:.2f}s", flush=True)

    sizes = [int(x) for x in sys.argv[1:]] or [500, 1000, 2000]
    for n in sizes:
        run_one(n)


if __name__ == "__main__":
    main()
