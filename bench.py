#!/usr/bin/env python3
"""End-to-end benchmark: REAL joins/s of the NJ engine on the live backend.

Runs the actual fast_nj join loop (search + fused join + top-hits
maintenance, ref NeighbourJoining.tcc:2796-3155) on a founder-mutation
synthetic alignment, and the reference binary (-noml -nosupport) on the SAME
FASTA as the baseline.  This is BASELINE.md's primary metric (NJ joins/sec /
wall-clock-to-tree) measured end-to-end, not a synthetic kernel.

vs_baseline = our joins/s / the reference binary's joins/s on this host.
NOTE the axon TPU backend adds ~27 ms tunnel latency to every blocking
fetch, which bounds the serial join loop; see bench_e2e.py for backend
comparisons and docs/SCALING.md for the latency math.

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


def main():
    from bench_e2e import synth_codes, write_fasta

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 500

    import jax
    backend = jax.default_backend()

    from veryfasttree_tpu.engine.nj import NeighbourJoining
    from veryfasttree_tpu.options import Options
    from veryfasttree_tpu.pipeline import _enable_compilation_cache

    _enable_compilation_cache()
    codes = synth_codes(n, p)

    opts = Options(n_codes=4, show_progress=False)
    opts.derive_settings()
    t0 = time.perf_counter()
    nj = NeighbourJoining(opts, codes, None, None)
    t_setup = time.perf_counter() - t0
    t0 = time.perf_counter()
    nj.fast_nj()
    t_join = time.perf_counter() - t0
    joins = n - 3
    joins_per_s = joins / t_join

    # reference binary on the same input (the upstream CPU implementation)
    ref_joins_per_s = None
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
            ref_joins_per_s = joins / t_ref

    out = {
        "metric": f"NJ end-to-end joins/s (N={n}, P={p}, nt, {backend})",
        "value": round(joins_per_s, 2),
        "unit": "joins/s",
        "vs_baseline": (round(joins_per_s / ref_joins_per_s, 3)
                        if ref_joins_per_s else None),
        "join_phase_s": round(t_join, 2),
        "setup_s": round(t_setup, 2),
        "reference_wall_s": round(t_ref, 2) if t_ref else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
