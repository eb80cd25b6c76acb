#!/usr/bin/env python3
"""Scaling battery: end-to-end -noml NJ at large N on the live backend.

Reports per-phase wall (store init, top-hits seeding, join epoch), joins/s,
and peak device memory vs the hbm_plan prediction.  The point (VERDICT r3
item 4): demonstrate per-join cost stays ~O(sqrt N) -- the epoch's own work
per join is O(m) row gathers, m = 1.5 sqrt(N) -- not O(N).

Usage: python scripts/bench_scale.py [N ...]   (default 5000 20000 100000)
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_one(n, p=500):
    import math

    import jax
    import numpy as np

    from bench_e2e import synth_codes
    from veryfasttree_tpu.engine import epoch as epoch_mod
    from veryfasttree_tpu.engine.nj import NeighbourJoining
    from veryfasttree_tpu.engine.tophits import TopHits
    from veryfasttree_tpu.options import Options

    codes = synth_codes(n, p)
    opts = Options(n_codes=4, show_progress=False)
    opts.derive_settings()

    t0 = time.perf_counter()
    nj = NeighbourJoining(opts, codes, None, None)
    t_store = time.perf_counter() - t0

    t0 = time.perf_counter()
    m = int(0.5 + opts.tophits_mult * math.sqrt(nj.n_seqs))
    th = TopHits(opts, nj.maxnodes, m)
    th.set_all_leaf_tophits(nj)
    th.reset_top_visible(nj, nj.n_seqs)
    t_tophits = time.perf_counter() - t0

    t0 = time.perf_counter()
    epoch_mod.run_epoch(nj, th)
    t_join = time.perf_counter() - t0

    joins = n - 3
    mem = {}
    try:
        stats = jax.devices()[0].memory_stats() or {}
        mem = {"peak_hbm_gb": round(stats.get("peak_bytes_in_use", 0) / 2**30, 2)}
    except Exception:
        pass
    # total ME tree length as the self-check quality metric (finite, sane);
    # batched lengths (the serial walk fetches once per node)
    from veryfasttree_tpu.engine import batched
    batched.update_branch_lengths_batched(nj)
    tl = float(np.sum(np.abs(nj.tree.branchlength[: nj.tree.maxnode])))
    out = {
        "N": n, "P": p,
        "store_s": round(t_store, 1),
        "tophits_s": round(t_tophits, 1),
        "epoch_s": round(t_join, 1),
        "joins_per_s": round(joins / t_join, 1),
        "ms_per_join": round(1000 * t_join / joins, 3),
        "tree_length": round(tl, 2),
        "two_tier": bool(nj.prof.two_tier),
        **mem,
    }
    print(json.dumps(out), flush=True)
    if "--oracle" in sys.argv:
        # tier-2 quality gate vs the reference on the same input: run both
        # pipelines' full -noml on the same FASTA and compare tree lengths.
        # Free the battery's store first (two live 20k stores + gather
        # transients exhaust HBM).
        import gc
        del nj
        gc.collect()
        out["oracle"] = run_oracle_noml(codes, n, p)
        if out["oracle"]:
            full = run_full_noml(codes)
            out["full_noml_wall_s"] = round(full["wall_s"], 1)
            out["full_noml_tree_length"] = round(full["tree_length"], 2)
            ref_len = out["oracle"]["tree_length"]
            out["tree_length_vs_oracle_rel"] = round(
                abs(full["tree_length"] - ref_len) / ref_len, 5)
            print(json.dumps({k: v for k, v in out.items()
                              if k in ("N", "oracle", "full_noml_wall_s",
                                       "full_noml_tree_length",
                                       "tree_length_vs_oracle_rel")}),
                  flush=True)
    return out


def run_full_noml(codes):
    """Full -noml -nosupport pipeline wall + tree length."""
    import io
    import re

    from bench_e2e import ALPHA
    from veryfasttree_tpu.options import Options
    from veryfasttree_tpu.pipeline import run_pipeline

    lines = []
    for i, row in enumerate(codes):
        lines.append(f">s{i}")
        lines.append("".join(ALPHA[c] for c in row))
    fasta = io.StringIO("\n".join(lines) + "\n")
    opts = Options(n_codes=4, show_progress=False, ml_nni=0, n_bootstrap=0)
    opts.derive_settings()
    out = io.StringIO()
    t0 = time.perf_counter()
    run_pipeline(opts, fasta, out)
    wall = time.perf_counter() - t0
    nw = out.getvalue()
    tl = sum(float(x) for x in re.findall(r":(-?[0-9.]+)", nw))
    return {"wall_s": wall, "tree_length": tl}


def run_oracle_noml(codes, n, p):
    import re
    import subprocess

    from bench_e2e import write_fasta

    oracle = os.environ.get("VFT_ORACLE", "/tmp/refbuild/VeryFastTree")
    if not os.path.exists(oracle):
        return None
    fasta = f"/tmp/bench_scale_{n}_{p}.fasta"
    write_fasta(fasta, codes)
    t0 = time.perf_counter()
    res = subprocess.run([oracle, "-nt", "-noml", "-nosupport", "-nopr",
                          fasta], capture_output=True, text=True,
                         timeout=36000)
    wall = time.perf_counter() - t0
    if res.returncode != 0:
        return None
    tl = sum(float(x) for x in re.findall(r":(-?[0-9.]+)", res.stdout))
    return {"wall_s": round(wall, 1), "tree_length": round(tl, 2)}


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from veryfasttree_tpu.pipeline import _enable_compilation_cache

    _enable_compilation_cache()
    jax.config.update("jax_default_matmul_precision", "highest")
    print(f"backend={jax.default_backend()}", flush=True)
    t0 = time.perf_counter()
    np.asarray(jnp.zeros(8) + 1)
    print(f"warm_d2h={time.perf_counter()-t0:.1f}s", flush=True)

    sizes = [int(x) for x in sys.argv[1:] if not x.startswith('--')] \
        or [5000, 20000, 100000]
    for n in sizes:
        run_one(n)


if __name__ == "__main__":
    main()
