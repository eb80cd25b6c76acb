#!/usr/bin/env python3
"""Attribute per-join epoch time at large N via the ablation hooks.

Runs the SAME prepared engine state through run_epoch(max_joins=K) under a
battery of VFT_EPOCH_ABLATE settings (results are wrong under ablation --
timing only).  Usage: python scripts/ablate_epoch20k.py [N] [K]
"""
import copy
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

    import math

    import jax.numpy as jnp
    import numpy as np

    from bench_e2e import synth_codes
    from veryfasttree_tpu.engine import epoch as epoch_mod
    from veryfasttree_tpu.engine.nj import NeighbourJoining
    from veryfasttree_tpu.engine.tophits import TopHits
    from veryfasttree_tpu.options import Options
    from veryfasttree_tpu.pipeline import _enable_compilation_cache

    _enable_compilation_cache()
    t0 = time.perf_counter()
    np.asarray(jnp.zeros(8) + 1)
    print(f"# d2h open {time.perf_counter()-t0:.1f}s", flush=True)

    codes = synth_codes(n, 500)
    opts = Options(n_codes=4, show_progress=False)
    opts.derive_settings()

    def build():
        nj = NeighbourJoining(opts, codes, None, None)
        m = int(0.5 + opts.tophits_mult * math.sqrt(nj.n_seqs))
        th = TopHits(opts, nj.maxnodes, m)
        th.set_all_leaf_tophits(nj)
        th.reset_top_visible(nj, nj.n_seqs)
        return nj, th

    t0 = time.perf_counter()
    nj0, th0 = build()
    print(f"# build {time.perf_counter()-t0:.1f}s", flush=True)

    configs = ["", "nowork", "search", "hill", "thj", "uv,utv", "rtv,ev",
               "exp", "j_out,j_nref", "j_avg,j_self"]
    for abl in configs:
        os.environ["VFT_EPOCH_ABLATE"] = abl
        nj, th = build()  # fresh state each time (epoch mutates it)
        t0 = time.perf_counter()
        epoch_mod.run_epoch(nj, th, max_joins=k)
        dt = time.perf_counter() - t0
        print(f"ablate={abl or 'none':14s} wall={dt:7.1f}s "
              f"ms/join={1000*dt/k:7.2f}", flush=True)


if __name__ == "__main__":
    main()
