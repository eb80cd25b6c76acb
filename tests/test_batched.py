"""Batched (threads > 1) mode: quality parity with the serial path."""
import io
import re

import pytest

from util import have_oracle, rf_distance, run_oracle, simulate_alignment, write_fasta

pytestmark = pytest.mark.skipif(not have_oracle(), reason="oracle not built")


def _total_len(nw):
    return sum(float(x) for x in re.findall(r":(-?[0-9.]+)", nw))


def test_batched_me_quality(tmp_path):
    from veryfasttree_tpu.options import Options
    from veryfasttree_tpu.pipeline import run_pipeline

    seqs = simulate_alignment(80, 300, seed=17, mutation=0.2)
    fasta = str(tmp_path / "t.fasta")
    write_fasta(fasta, seqs)
    nw_ref, _ = run_oracle(["-nt", "-noml", "-nosupport"], fasta)
    opts = Options(n_codes=4, ml_nni=0, n_bootstrap=0, show_progress=False,
                   threads=2)
    opts.derive_settings()
    out = io.StringIO()
    with open(fasta) as f:
        run_pipeline(opts, f, out)
    nw = out.getvalue().strip()
    # equal-quality guarantee (docs/PARITY.md tier 3): ME tree length within 0.1%
    assert abs(_total_len(nw) - _total_len(nw_ref)) < 0.001 * _total_len(nw_ref)


def test_batched_ml_quality(tmp_path):
    from veryfasttree_tpu.options import Options
    from veryfasttree_tpu.pipeline import run_pipeline

    seqs = simulate_alignment(40, 200, seed=18, mutation=0.2)
    fasta = str(tmp_path / "t.fasta")
    write_fasta(fasta, seqs)
    nw_ref, err = run_oracle(["-nt", "-nosupport"], fasta)
    m = [re.search(r"LogLk\s*=?\s*(-?\d+\.\d+)", l) for l in err.splitlines()
         if "Optimize all lengths" in l]
    ref_ll = float(m[-1].group(1))
    opts = Options(n_codes=4, n_bootstrap=0, show_progress=False, threads=2)
    opts.derive_settings()
    out = io.StringIO()
    log = io.StringIO()
    with open(fasta) as f:
        run_pipeline(opts, f, out, log_fp=log)
    m = [re.search(r"LogLk\s*=?\s*(-?\d+\.\d+)", l)
         for l in log.getvalue().splitlines() if "Optimize all lengths" in l]
    our_ll = float(m[-1].group(1))
    # final LogLk within 1 part in 1e4 of the reference
    assert abs(our_ll - ref_ll) < 1e-4 * abs(ref_ll)
