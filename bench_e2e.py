#!/usr/bin/env python3
"""End-to-end NJ benchmark: REAL joins/s of fast_nj on the device, plus
wall-clock-to-tree vs the reference binary on the same input.

This is the BASELINE.md primary metric (NJ joins/sec; wall-clock to tree),
measured by actually running the engine -- not a synthetic kernel.  The
alignment is a founder-mutation synthetic (correlated like real data so
top-hits behaves realistically).

Usage: python bench_e2e.py [N] [P] [--cpu] [--two-tier] [--ref]
Prints one JSON line per phase and a summary line.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
ORACLE = os.environ.get("VFT_ORACLE", "/tmp/refbuild/VeryFastTree")

ALPHA = "ACGT"


def synth_codes(n, p, seed=0, n_codes=4):
    rng = np.random.default_rng(seed)
    n_founders = max(4, n // 20)
    founders = rng.integers(0, n_codes, size=(n_founders, p))
    rows = founders[rng.integers(0, n_founders, size=n)]
    mut = rng.random((n, p)) < 0.1
    rows = np.where(mut, rng.integers(0, n_codes, size=(n, p)), rows)
    # make rows unique (append a unique suffix pattern) so Uniquify keeps all
    tag = ((np.arange(n)[:, None] >> np.arange(16)[None, :]) & 1).astype(rows.dtype)
    rows[:, -16:] = tag
    return rows.astype(np.int8)


def write_fasta(path, codes):
    lut = np.frombuffer(ALPHA.encode(), dtype=np.uint8)
    with open(path, "wb") as f:
        for i, row in enumerate(codes):
            f.write(b">s%d\n" % i)
            f.write(lut[row].tobytes() + b"\n")


def warm_d2h():
    """Open the d2h transfer channel before timing anything: the FIRST
    device->host fetch of a process costs 30-300 s on the axon backend and
    every later sync ~25 ms (see CLAUDE.md latency model)."""
    import jax.numpy as jnp
    t0 = time.perf_counter()
    np.asarray(jnp.zeros(8))
    return time.perf_counter() - t0


def run_ours(codes, two_tier=None, noml=True):
    from veryfasttree_tpu.engine.nj import NeighbourJoining
    from veryfasttree_tpu.options import Options
    from veryfasttree_tpu.pipeline import _enable_compilation_cache

    _enable_compilation_cache()
    t_warm = warm_d2h()
    print(f"# d2h channel warmup: {t_warm:.1f}s", file=sys.stderr)
    opts = Options(n_codes=4, show_progress=False)
    if two_tier is not None:
        opts.two_tier_min = 0 if two_tier else -1
    opts.derive_settings()
    t0 = time.perf_counter()
    nj = NeighbourJoining(opts, codes, None, None)
    t_setup = time.perf_counter() - t0
    t0 = time.perf_counter()
    nj.fast_nj()
    t_join = time.perf_counter() - t0
    return nj, t_setup, t_join


def run_reference(fasta, threads=None):
    if not os.path.exists(ORACLE):
        return None
    args = [ORACLE, "-nt", "-noml", "-nosupport", "-nopr"]
    if threads:
        args += ["-threads", str(threads)]
    t0 = time.perf_counter()
    res = subprocess.run(args + [fasta], capture_output=True, text=True,
                         timeout=36000)
    t = time.perf_counter() - t0
    if res.returncode != 0:
        print(f"# reference failed: {res.stderr[-500:]}", file=sys.stderr)
        return None
    # join-phase timing from the verbose progress line if present
    return t


def bench_ml(n=250, p=500):
    """ML-NNI rounds/hr (BASELINE.md metric): build the ME tree, switch the
    store to ML, time the full ML phase (NNI rounds + CAT rates + final
    branch lengths) via run_ml_phase on whatever backend is live."""
    import io
    import math

    from veryfasttree_tpu.engine import ml as ml_mod
    from veryfasttree_tpu.engine.nj import NeighbourJoining
    from veryfasttree_tpu.options import Options
    from veryfasttree_tpu.pipeline import _enable_compilation_cache
    from veryfasttree_tpu.utils.progress import ProgressReport

    _enable_compilation_cache()
    import jax
    codes = synth_codes(n, p)
    # accelerator backends default to the level-batched (threads) mode,
    # mirroring pipeline._run_single
    threads = 8 if jax.default_backend() != "cpu" else 1

    def one_phase():
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
        return rounds, time.perf_counter() - t0

    rounds, t_cold = one_phase()   # includes jit compiles of the ML stack
    rounds, t_ml = one_phase()     # cache-warm: the steady-state number
    return rounds, t_ml, t_cold


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 10000
    p = int(args[1]) if len(args) > 1 else 1000
    if "--cpu" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
    two_tier = True if "--two-tier" in sys.argv else None

    import jax
    backend = jax.default_backend()

    if "--ml" in sys.argv:
        rounds, t_ml, t_cold = bench_ml(n if args else 250,
                                        p if len(args) > 1 else 500)
        print(json.dumps({
            "metric": f"ML phase (NNI rounds + CAT + lengths, N={n if args else 250}, {backend})",
            "value": round(rounds / (t_ml / 3600.0), 2),
            "unit": "ML-NNI rounds/hr",
            "ml_phase_s": round(t_ml, 2),
            "ml_phase_cold_s": round(t_cold, 2),
            "rounds": rounds,
        }))
        return

    codes = synth_codes(n, p)
    print(f"# N={n} P={p} backend={backend}", file=sys.stderr)

    nj, t_setup, t_join = run_ours(codes, two_tier=two_tier)
    joins = n - 3
    joins_per_s = joins / t_join
    d = nj.debug
    print(json.dumps({
        "metric": f"fast_nj joins/s (N={n}, P={p}, nt, {backend})",
        "value": round(joins_per_s, 2),
        "unit": "joins/s",
        "setup_s": round(t_setup, 2),
        "join_phase_s": round(t_join, 2),
        "two_tier": bool(nj.prof.two_tier),
    }))

    if "--ref" in sys.argv:
        fasta = f"/tmp/bench_e2e_{n}_{p}.fasta"
        write_fasta(fasta, codes)
        t_ref = run_reference(fasta)
        if t_ref is not None:
            print(json.dumps({
                "metric": f"reference -noml wall-clock (N={n}, P={p})",
                "value": round(t_ref, 2),
                "unit": "s",
                "ours_total_s": round(t_setup + t_join, 2),
                "speedup": round(t_ref / (t_setup + t_join), 3),
            }))


if __name__ == "__main__":
    main()
