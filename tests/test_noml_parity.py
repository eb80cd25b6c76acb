"""Oracle parity tests for the minimum-evolution pipeline (config[0]-style).

Treats the reference binary as the golden oracle (SURVEY.md section 4): same
FASTA in, compare join order, final Newick topology (RF) and branch lengths,
and bootstrap support values.
"""
import io

import pytest

from util import (have_oracle, parse_join_log, rf_distance, run_oracle,
                  simulate_alignment, write_fasta)

pytestmark = pytest.mark.skipif(not have_oracle(), reason="reference oracle not built")


def _run_ours(fasta, **kw):
    from veryfasttree_tpu.options import Options
    from veryfasttree_tpu.pipeline import run_pipeline

    opts = Options(show_progress=False, **kw)
    opts.derive_settings()
    out = io.StringIO()
    with open(fasta) as f:
        nj, sc = run_pipeline(opts, f, out)
    return out.getvalue().strip(), nj, sc


def test_join_order_parity(tmp_path):
    seqs = simulate_alignment(30, 200, seed=3)
    fasta = str(tmp_path / "t.fasta")
    write_fasta(fasta, seqs)
    _, err = run_oracle(["-nt", "-noml", "-notop", "-nni", "0", "-spr", "0",
                         "-nosupport", "-verbose", "3"], fasta)
    ref_joins = [(min(a, b), max(a, b)) for a, b in parse_join_log(err)]

    from veryfasttree_tpu.io.alignment import Uniquify, read_alignment, seqs_to_codes
    from veryfasttree_tpu.engine.nj import NeighbourJoining
    from veryfasttree_tpu.options import Options

    opts = Options(n_codes=4, tophits_mult=0.0, show_progress=False)
    opts.derive_settings()
    with open(fasta) as f:
        aln = read_alignment(f, opts)
    uniq = Uniquify.build(aln)
    codes = seqs_to_codes(uniq.unique_seq, opts)
    nj = NeighbourJoining(opts, codes, None, None)
    nj.fast_nj()
    t = nj.tree
    ours = [(int(t.children[n][0]), int(t.children[n][1]))
            for n in range(nj.n_seqs, t.maxnode) if n != t.root]
    assert ours == ref_joins


def test_noml_newick_identical(tmp_path):
    seqs = simulate_alignment(40, 300, seed=7)
    fasta = str(tmp_path / "t.fasta")
    write_fasta(fasta, seqs)
    nw_ref, _ = run_oracle(["-nt", "-noml", "-notop", "-spr", "0", "-nosupport"], fasta)
    nw_ours, _, _ = _run_ours(fasta, n_codes=4, tophits_mult=0.0, spr=0,
                              ml_nni=0, n_bootstrap=0)
    rf, tot = rf_distance(nw_ref, nw_ours)
    assert rf == 0
    assert nw_ref == nw_ours  # branch lengths bit-identical at %.5f


def test_noml_bootstrap_supports_identical(tmp_path):
    seqs = simulate_alignment(25, 200, seed=11)
    fasta = str(tmp_path / "t.fasta")
    write_fasta(fasta, seqs)
    nw_ref, _ = run_oracle(["-nt", "-noml", "-notop", "-spr", "0", "-boot", "100"], fasta)
    nw_ours, _, _ = _run_ours(fasta, n_codes=4, tophits_mult=0.0, spr=0,
                              ml_nni=0, n_bootstrap=100)
    assert nw_ref == nw_ours


def test_fused_vs_unfused_join_identical(tmp_path, monkeypatch):
    """The fused one-dispatch join (engine/fused.py) and the unfused
    multi-dispatch reference path duplicate the BIONJ / out-distance /
    criterion math; this A/B guard catches divergence without the oracle."""
    seqs = simulate_alignment(60, 250, seed=23)
    fasta = str(tmp_path / "t.fasta")
    write_fasta(fasta, seqs)

    from veryfasttree_tpu.engine import nj as nj_mod

    results = {}
    for fused in (True, False):
        monkeypatch.setattr(nj_mod, "USE_FUSED_JOIN", fused)
        nw, nj, _ = _run_ours(fasta, n_codes=4, ml_nni=0, n_bootstrap=0)
        results[fused] = (nw, list(nj.join_log))
    assert results[True][1] == results[False][1]  # identical join order
    assert results[True][0] == results[False][0]  # identical Newick


def test_protein_blosum45_noml(tmp_path):
    seqs = simulate_alignment(20, 150, alphabet="ARNDCQEGHILKMFPSTWYV", seed=5)
    fasta = str(tmp_path / "t.fasta")
    write_fasta(fasta, seqs)
    nw_ref, _ = run_oracle(["-noml", "-notop", "-spr", "0", "-nosupport"], fasta)
    nw_ours, _, _ = _run_ours(fasta, n_codes=20, tophits_mult=0.0, spr=0,
                              ml_nni=0, n_bootstrap=0)
    rf, tot = rf_distance(nw_ref, nw_ours)
    assert rf == 0, (nw_ref, nw_ours)
