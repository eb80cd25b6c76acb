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


def test_batched_supports_match_serial(tmp_path):
    """Level-batched testSplitsMinEvo and reliabilityNJ reproduce the serial
    results (identical counts; bit-identical boot supports, bionj off)."""
    import numpy as np

    from veryfasttree_tpu.engine import rearrange, supports
    from veryfasttree_tpu.engine.nj import NeighbourJoining
    from veryfasttree_tpu.io.alignment import Uniquify, read_alignment, \
        seqs_to_codes
    from veryfasttree_tpu.options import Options

    seqs = simulate_alignment(60, 250, seed=6)
    fasta = str(tmp_path / "t.fasta")
    write_fasta(fasta, seqs)
    opts = Options(n_codes=4, show_progress=False, n_bootstrap=50)
    opts.derive_settings()
    with open(fasta) as f:
        aln = read_alignment(f, opts)
    uniq = Uniquify.build(aln)
    codes = seqs_to_codes(uniq.unique_seq, opts)

    def build():
        nj = NeighbourJoining(opts, codes, None, None)
        nj.fast_nj()
        rearrange.update_branch_lengths(nj)
        return nj

    nj1 = build()
    sc1 = supports.test_splits_min_evo(nj1)
    supports.reliability_nj(nj1)
    nj2 = build()
    sc2 = supports.test_splits_min_evo_batched(nj2)
    supports.reliability_nj_batched(nj2)
    assert (sc1.n_splits, sc1.n_bad_splits) == (sc2.n_splits, sc2.n_bad_splits)
    assert abs(sc1.d_worst_delta_unconstrained
               - sc2.d_worst_delta_unconstrained) < 1e-12
    m = nj1.tree.maxnode
    np.testing.assert_array_equal(nj1.tree.support[:m], nj2.tree.support[:m])


def test_batched_sh_supports_quality(tmp_path):
    """Batched testSplitsML + SH supports track the serial path (equal-
    quality tier: identical split counts, supports within 0.1)."""
    import re

    from veryfasttree_tpu.options import Options
    from veryfasttree_tpu.pipeline import run_pipeline

    seqs = simulate_alignment(30, 200, seed=12)
    fasta = str(tmp_path / "t.fasta")
    write_fasta(fasta, seqs)

    def run(threads):
        opts = Options(show_progress=False, n_codes=4, n_bootstrap=200,
                       threads=threads)
        opts.derive_settings()
        out = io.StringIO()
        with open(fasta) as f:
            nj, sc = run_pipeline(opts, f, out, log_fp=None)
        return out.getvalue().strip(), sc

    nw1, sc1 = run(1)
    nw2, sc2 = run(2)
    assert (sc1.n_splits, sc1.n_bad_splits) == (sc2.n_splits, sc2.n_bad_splits)
    s1 = [float(x) for x in re.findall(r"\)([0-9.]+):", nw1)]
    s2 = [float(x) for x in re.findall(r"\)([0-9.]+):", nw2)]
    assert len(s1) == len(s2) and s1
    assert max(abs(a - b) for a, b in zip(s1, s2)) <= 0.1
