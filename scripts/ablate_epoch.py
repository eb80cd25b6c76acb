#!/usr/bin/env python3
"""Attribute per-join device time inside the epoch by phase ablation.

Each ablation recompiles the epoch with one phase skipped; the per-join
delta vs baseline is that phase's cost (results are WRONG under ablation --
timing only).  Usage: python scripts/ablate_epoch.py [N] [ablations...]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_one(n, p, ablate):
    import math

    from bench_e2e import synth_codes
    from veryfasttree_tpu.engine import epoch as epoch_mod
    from veryfasttree_tpu.engine.nj import NeighbourJoining
    from veryfasttree_tpu.engine.tophits import TopHits
    from veryfasttree_tpu.options import Options

    if ablate:
        os.environ["VFT_EPOCH_ABLATE"] = ablate
    else:
        os.environ.pop("VFT_EPOCH_ABLATE", None)
    codes = synth_codes(n, p)
    opts = Options(n_codes=4, show_progress=False)
    opts.derive_settings()

    def build():
        nj = NeighbourJoining(opts, codes, None, None)
        m = int(0.5 + opts.tophits_mult * math.sqrt(nj.n_seqs))
        th = TopHits(opts, nj.maxnodes, m)
        th.set_all_leaf_tophits(nj)
        th.reset_top_visible(nj, nj.n_seqs)
        return nj, th

    nj, th = build()
    t0 = time.perf_counter()
    epoch_mod.run_epoch(nj, th)
    t_cold = time.perf_counter() - t0
    nj, th = build()
    t0 = time.perf_counter()
    epoch_mod.run_epoch(nj, th)
    t_warm = time.perf_counter() - t0
    joins = n - 3
    print(f"N={n} ablate={ablate or 'none':24s} warm={t_warm:.2f}s "
          f"ms/join={1000*t_warm/joins:.2f} (cold {t_cold:.1f}s)", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from veryfasttree_tpu.pipeline import _enable_compilation_cache

    _enable_compilation_cache()
    jax.config.update("jax_default_matmul_precision", "highest")
    np.asarray(jnp.zeros(8) + 1)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    abls = sys.argv[2:] or ["", "uv", "utv", "uv,utv", "rtv", "ev", "exp",
                            "hill", "uv,utv,rtv,ev,exp,hill"]
    for a in abls:
        run_one(n, 500, a)


if __name__ == "__main__":
    main()
