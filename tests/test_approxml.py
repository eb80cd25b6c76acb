"""-approxml (nearP rough AA posteriors, ref NeighbourJoining.tcc:2335-2429):
same topology as the exact path at small N, with the rough-posterior debug
counter actually incrementing."""
import io

import pytest

from util import have_oracle, rf_distance, run_oracle, simulate_alignment, write_fasta

AA = "ARNDCQEGHILKMFPSTWYV"


def _run_ours(fasta, **kw):
    from veryfasttree_tpu.options import Options
    from veryfasttree_tpu.pipeline import run_pipeline

    opts = Options(show_progress=False, **kw)
    opts.derive_settings()
    out = io.StringIO()
    log = io.StringIO()
    with open(fasta) as f:
        nj, sc = run_pipeline(opts, f, out, log_fp=log)
    return out.getvalue().strip(), log.getvalue(), nj


def test_approxml_counters_and_topology(tmp_path):
    # low mutation rate -> posteriors dominated by one character -> the
    # approximation fires on most positions (ref approxMLminf=0.95 gate)
    seqs = simulate_alignment(12, 120, alphabet=AA, seed=7, mutation=0.03)
    fasta = str(tmp_path / "t.fasta")
    write_fasta(fasta, seqs)
    nw_exact, _, nj_e = _run_ours(fasta, n_codes=20, tophits_mult=0.0, spr=0,
                                  n_bootstrap=0)
    nw_approx, _, nj_a = _run_ours(fasta, n_codes=20, tophits_mult=0.0, spr=0,
                                   n_bootstrap=0, exact_ml=False)
    # topology may differ on near-ties (the approximation is lossy by design;
    # oracle parity of the approx path is pinned in the test below) -- here we
    # check the rough path actually fires and the trees stay close
    assert rf_distance(nw_exact, nw_approx)[1] > 0  # same leaf set, parseable
    nj_a.ml.flush_posterior_counters()
    nj_e.ml.flush_posterior_counters()
    assert nj_a.debug.n_aa_posterior_rough > 0
    assert nj_e.debug.n_aa_posterior_rough == 0
    assert nj_e.debug.n_aa_posterior_exact > 0


@pytest.mark.skipif(not have_oracle(), reason="reference oracle not built")
def test_approxml_oracle_parity(tmp_path):
    seqs = simulate_alignment(12, 120, alphabet=AA, seed=8, mutation=0.05)
    fasta = str(tmp_path / "t.fasta")
    write_fasta(fasta, seqs)
    nw_ref, _ = run_oracle(["-approxml", "-notop", "-spr", "0", "-nosupport"],
                           fasta)
    nw_ours, _, _ = _run_ours(fasta, n_codes=20, tophits_mult=0.0, spr=0,
                              n_bootstrap=0, exact_ml=False)
    assert rf_distance(nw_ref, nw_ours)[0] == 0
