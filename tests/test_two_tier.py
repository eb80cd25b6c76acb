"""Two-tier (codes-only leaves) storage must be bit-equivalent to dense."""
import io

import numpy as np
import pytest

from util import rf_distance, simulate_alignment, write_fasta

from veryfasttree_tpu.engine.nj import NeighbourJoining
from veryfasttree_tpu.engine.profiles import MEProfiles
from veryfasttree_tpu.io.alignment import Uniquify, read_alignment, seqs_to_codes
from veryfasttree_tpu.options import Options


def _codes(n=25, p=150, seed=5, n_codes=4):
    opts = Options(n_codes=n_codes, tophits_mult=0.0, spr=0, ml_nni=0,
                   n_bootstrap=0, show_progress=False)
    opts.derive_settings()
    alpha = "ACGT" if n_codes == 4 else "ARNDCQEGHILKMFPSTWYV"
    seqs = simulate_alignment(n, p, alphabet=alpha, seed=seed, gap_frac=0.05)
    codes = seqs_to_codes(seqs, opts)
    return opts, codes


@pytest.mark.parametrize("n_codes", [4, 20])
def test_scan_equivalence(n_codes):
    opts, codes = _codes(n_codes=n_codes)
    from veryfasttree_tpu.models.distance_matrix import DistanceMatrix

    dmat = DistanceMatrix.blosum45() if n_codes == 20 else None
    dense = MEProfiles(codes, opts, dmat, 2 * len(codes), two_tier=False)
    tiered = MEProfiles(codes, opts, dmat, 2 * len(codes), two_tier=True)
    d1, w1 = dense.dist_one_vs_all(3)
    d2, w2 = tiered.dist_one_vs_all(3)
    n = 2 * len(codes)
    assert np.allclose(d1[:n], d2[:n], atol=1e-9)
    assert np.allclose(w1[:n], w2[:n], atol=1e-9)
    iis = np.array([0, 3, 7, 11])
    jjs = np.array([5, 2, 9, 0])
    assert np.allclose(dense.dist_pairs(iis, jjs)[0],
                       tiered.dist_pairs(iis, jjs)[0], atol=1e-9)
    p1, pw1 = dense.dist_pieces_pairs(iis, jjs)
    p2, pw2 = tiered.dist_pieces_pairs(iis, jjs)
    assert np.allclose(p1, p2, atol=1e-9)


@pytest.mark.parametrize("n_codes", [4, 20])
def test_scan_equivalence_fractional_query(n_codes):
    """One-vs-all with an INTERNAL (fractional-weight) query row: regression
    for the me_dist_many_codes double-weighting bug (the two-tier leaf scan
    multiplied the query weight in twice, which cancels only for binary leaf
    weights)."""
    opts, codes = _codes(n_codes=n_codes)
    from veryfasttree_tpu.models.distance_matrix import DistanceMatrix

    dmat = DistanceMatrix.blosum45() if n_codes == 20 else None
    dense = MEProfiles(codes, opts, dmat, 2 * len(codes), two_tier=False)
    tiered = MEProfiles(codes, opts, dmat, 2 * len(codes), two_tier=True)
    node = len(codes)  # first internal row: average of two gappy leaves
    dense.set_from_average(node, 0, 1, -1.0)
    tiered.set_from_average(node, 0, 1, -1.0)
    d1, w1 = dense.dist_one_vs_all(node)
    d2, w2 = tiered.dist_one_vs_all(node)
    n = len(codes) + 1
    assert np.allclose(d1[:n], d2[:n], atol=1e-6)
    assert np.allclose(w1[:n], w2[:n], atol=1e-6)


def test_full_noml_pipeline_equivalence(tmp_path):
    """End-to-end: two-tier NJ produces the identical tree."""
    seqs = simulate_alignment(40, 250, seed=57)
    fasta = str(tmp_path / "t.fasta")
    write_fasta(fasta, seqs)

    def run(two_tier):
        opts = Options(n_codes=4, ml_nni=0, n_bootstrap=0, show_progress=False)
        if two_tier:
            opts.two_tier_min = 0  # force on
        opts.derive_settings()
        from veryfasttree_tpu.pipeline import run_pipeline

        out = io.StringIO()
        with open(fasta) as f:
            run_pipeline(opts, f, out)
        return out.getvalue().strip()

    nw_dense = run(False)
    nw_tier = run(True)
    assert nw_dense == nw_tier
