"""Oracle parity for the DEFAULT configuration: top-hits search + hill-climb
+ SPR enabled (nothing disabled).  Round-1 pinned only -notop/-spr 0 configs;
these tests pin the actual default code paths, including the fused one-
dispatch-per-join driver (engine/fused.py).

* top-hits join order vs the oracle's -verbose 3 join log
  (ref topHitNJSearch tcc:4137-4264, fastNJ logging tcc:2994)
* bit-identical -noml Newick with SPR on (ref SPR tcc:6315-6404)
"""
import io

import pytest

from util import (have_oracle, parse_join_log, rf_distance, run_oracle,
                  simulate_alignment, write_fasta)

pytestmark = pytest.mark.skipif(not have_oracle(),
                                reason="reference oracle not built")


def _run_ours(fasta, **kw):
    from veryfasttree_tpu.options import Options
    from veryfasttree_tpu.pipeline import run_pipeline

    opts = Options(show_progress=False, **kw)
    opts.derive_settings()
    out = io.StringIO()
    with open(fasta) as f:
        nj, sc = run_pipeline(opts, f, out)
    return out.getvalue().strip(), nj, sc


def test_tophits_join_order(tmp_path):
    """Default top-hits search must reproduce the oracle's join sequence
    exactly (deterministic mode contract, ref README.md:7)."""
    seqs = simulate_alignment(100, 300, seed=21)
    fasta = str(tmp_path / "t.fasta")
    write_fasta(fasta, seqs)
    _, err = run_oracle(["-nt", "-noml", "-nni", "0", "-spr", "0",
                         "-nosupport", "-verbose", "3"], fasta)
    ref_joins = [(min(a, b), max(a, b)) for a, b in parse_join_log(err)]
    assert len(ref_joins) > 0

    nw, nj, _ = _run_ours(fasta, n_codes=4, nni=0, spr=0, ml_nni=0,
                          n_bootstrap=0)
    ours = [(min(a, b), max(a, b)) for a, b in nj.join_log]
    assert ours == ref_joins


def test_default_noml_newick_identical_with_spr(tmp_path):
    """Serial -noml with default top-hits AND SPR: bit-identical Newick."""
    seqs = simulate_alignment(60, 300, seed=23)
    fasta = str(tmp_path / "t.fasta")
    write_fasta(fasta, seqs)
    nw_ref, _ = run_oracle(["-nt", "-noml", "-nosupport"], fasta)
    nw_ours, _, _ = _run_ours(fasta, n_codes=4, ml_nni=0, n_bootstrap=0)
    rf, tot = rf_distance(nw_ref, nw_ours)
    assert rf == 0
    assert nw_ref == nw_ours


def test_tophits_2nd_level_join_order(tmp_path):
    """-2nd (2nd-level top hits) join order parity -- exercises the
    close-neighbor 2nd-level transfer and the hit-source promotion path."""
    seqs = simulate_alignment(120, 200, seed=29, mutation=0.1)
    fasta = str(tmp_path / "t.fasta")
    write_fasta(fasta, seqs)
    _, err = run_oracle(["-nt", "-noml", "-nni", "0", "-spr", "0",
                         "-nosupport", "-2nd", "-verbose", "3"], fasta)
    ref_joins = [(min(a, b), max(a, b)) for a, b in parse_join_log(err)]
    nw, nj, _ = _run_ours(fasta, n_codes=4, nni=0, spr=0, ml_nni=0,
                          n_bootstrap=0, use_tophits_2nd=True)
    ours = [(min(a, b), max(a, b)) for a, b in nj.join_log]
    assert ours == ref_joins
