#!/usr/bin/env python3
"""End-to-end benchmark: wall-clock-to-tree of the NJ phase vs the reference.

Runs the actual fast_nj pipeline (store init, top-hits seeding, the
device-resident join epoch -- ref NeighbourJoining.tcc:2796-3155) on a
founder-mutation synthetic alignment, and the reference binary
(-noml -nosupport) on the SAME FASTA as the baseline.

Honest accounting (BASELINE.md's metric is wall-clock-to-tree):
  * the one-time axon d2h channel open (30-300 s, a tunnel artifact that a
    local TPU does not pay) is warmed BEFORE timing and reported separately;
  * the run is done twice with fresh engines -- cold (includes jit compiles)
    and warm (persistent compilation cache hit) -- and BOTH wall times are
    reported; `vs_baseline` uses the warm end-to-end wall including setup,
    `vs_baseline_cold` the cold one.

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


def run_once(codes):
    """Full -noml -nosupport pipeline (NJ + ME NNI + SPR + branch lengths),
    matching exactly what the reference binary is timed doing."""
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
    nj = run_pipeline(opts, fasta, out)
    t_wall = time.perf_counter() - t0
    return nj, t_wall


def main():
    from bench_e2e import synth_codes, write_fasta

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 500

    import jax
    import jax.numpy as jnp
    import numpy as np
    backend = jax.default_backend()

    from veryfasttree_tpu.pipeline import _enable_compilation_cache

    _enable_compilation_cache()
    codes = synth_codes(n, p)
    joins = n - 3

    # one-time tunnel channel open; never part of any phase timing
    t0 = time.perf_counter()
    np.asarray(jnp.zeros(8) + 1)
    t_d2h = time.perf_counter() - t0

    _, wall_cold = run_once(codes)
    if wall_cold < 600:
        _, wall_warm = run_once(codes)
    else:
        wall_warm = wall_cold   # too slow to double-run; report cold

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
        "metric": f"-noml wall-to-tree (N={n}, P={p}, nt, {backend})",
        "value": round(wall_warm, 2),
        "unit": "s",
        "vs_baseline": round(t_ref / wall_warm, 3) if t_ref else None,
        "vs_baseline_cold": round(t_ref / wall_cold, 3) if t_ref else None,
        "joins_per_s_warm": round(joins / wall_warm, 2),
        "wall_cold_s": round(wall_cold, 2),
        "d2h_channel_open_s": round(t_d2h, 2),
        "reference_wall_s": round(t_ref, 2) if t_ref else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
