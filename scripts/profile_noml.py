#!/usr/bin/env python3
"""Per-phase wall profile of the full -noml pipeline on the live backend.

Times NJ (store/tophits/epoch), each ME NNI round, each SPR round, and
branch lengths, cold then warm.  Usage: python scripts/profile_noml.py [N] [P]
"""
import io
import json
import os
import sys
import time
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench_e2e import synth_codes, warm_d2h  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 500

    from veryfasttree_tpu.engine import batched, spr_epoch
    from veryfasttree_tpu.options import Options
    from veryfasttree_tpu.pipeline import _enable_compilation_cache, run_pipeline

    _enable_compilation_cache()
    print(f"# d2h open: {warm_d2h():.1f}s", file=sys.stderr)
    codes = synth_codes(n, p)
    from bench_e2e import ALPHA
    lines = []
    for i, row in enumerate(codes):
        lines.append(f">s{i}")
        lines.append("".join(ALPHA[c] for c in row))
    fasta_text = "\n".join(lines) + "\n"

    tally = defaultdict(float)
    calls = defaultdict(int)

    def wrap(mod, name, label):
        fn = getattr(mod, name)

        def wrapped(*a, **kw):
            t0 = time.perf_counter()
            out = fn(*a, **kw)
            tally[label] += time.perf_counter() - t0
            calls[label] += 1
            return out
        setattr(mod, name, wrapped)

    wrap(batched, "do_nni_batched", "me_nni_round")
    wrap(spr_epoch, "run_spr_epoch", "spr_round")
    wrap(batched, "update_branch_lengths_batched", "me_lengths")
    import veryfasttree_tpu.engine.nj as njmod
    import veryfasttree_tpu.engine.epoch as epoch_mod
    import veryfasttree_tpu.engine.tophits as th_mod
    wrap(epoch_mod, "run_epoch", "nj_epoch")
    wrap(th_mod.TopHits, "set_all_leaf_tophits", "nj_tophits")

    def one():
        tally.clear()
        calls.clear()
        opts = Options(n_codes=4, show_progress=False, ml_nni=0, n_bootstrap=0)
        opts.derive_settings()
        out = io.StringIO()
        t0 = time.perf_counter()
        run_pipeline(opts, io.StringIO(fasta_text), out)
        return time.perf_counter() - t0

    cold = one()
    cold_t = {k: round(v, 2) for k, v in sorted(tally.items(), key=lambda x: -x[1])}
    cold_c = dict(calls)
    warm = one()
    warm_t = {k: round(v, 2) for k, v in sorted(tally.items(), key=lambda x: -x[1])}
    print(json.dumps({
        "n": n, "p": p,
        "cold_wall_s": round(cold, 2), "warm_wall_s": round(warm, 2),
        "warm_stage_s": warm_t, "warm_calls": dict(calls),
        "cold_stage_s": cold_t, "cold_calls": cold_c,
    }, indent=1))


if __name__ == "__main__":
    main()
