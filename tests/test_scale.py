"""Scale tests: PARITY.md tier-2 enforcement at N=1000 and a >=20k-taxa
two-tier join-loop smoke (the regime the 1M-taxa north star lives in)."""
import io
import re

import numpy as np
import pytest

from util import have_oracle, run_oracle, simulate_alignment, write_fasta


def _tree_length(newick: str) -> float:
    return sum(float(x) for x in re.findall(r":(\d+\.?\d*(?:[eE][-+]?\d+)?)",
                                            newick))


def test_tier2_n1000_tree_length(tmp_path):
    """PARITY.md tier 2: at N=1000 the join order diverges from the reference
    on float near-ties, but total minimum-evolution tree length must agree
    within 0.1% (the reference's own cross-compiler variation class)."""
    if not have_oracle():
        pytest.skip("reference oracle not built")
    seqs = simulate_alignment(1000, 300, seed=42)
    fasta = str(tmp_path / "t1000.fasta")
    write_fasta(fasta, seqs)
    nw_ref, _ = run_oracle(["-nt", "-noml", "-nosupport", "-nopr"], fasta)

    from veryfasttree_tpu.options import Options
    from veryfasttree_tpu.pipeline import run_pipeline

    opts = Options(show_progress=False, n_codes=4, ml_nni=0, n_bootstrap=0)
    opts.derive_settings()
    out = io.StringIO()
    with open(fasta) as f:
        run_pipeline(opts, f, out, log_fp=None)
    nw_ours = out.getvalue().strip()

    len_ref = _tree_length(nw_ref)
    len_ours = _tree_length(nw_ours)
    assert len_ref > 0
    rel = abs(len_ours - len_ref) / len_ref
    assert rel < 1e-3, (len_ours, len_ref, rel)


def test_two_tier_20k_join_smoke():
    """>=20k unique sequences trips two-tier storage automatically
    (two_tier_min default); run the top-hits init plus a few hundred joins
    and check the criterion trajectory is sane (finite, joins recorded,
    new profiles land in the internal tier)."""
    rng = np.random.default_rng(3)
    n, p = 20000, 96
    n_founders = 256
    founders = rng.integers(0, 4, size=(n_founders, p))
    rows = founders[rng.integers(0, n_founders, size=n)]
    mut = rng.random((n, p)) < 0.08
    rows = np.where(mut, rng.integers(0, 4, size=(n, p)), rows)
    # unique tag in the last 15 positions so all sequences are distinct
    tag = ((np.arange(n)[:, None] >> np.arange(15)[None, :]) & 1)
    rows[:, -15:] = tag
    codes = rows.astype(np.int8)

    from veryfasttree_tpu.engine.nj import NeighbourJoining
    from veryfasttree_tpu.options import Options

    opts = Options(show_progress=False, n_codes=4, ml_nni=0, n_bootstrap=0)
    opts.derive_settings()
    nj = NeighbourJoining(opts, codes, None, None)
    assert nj.prof.two_tier, "N=20000 must select two-tier storage"

    n_joins = 300
    nj.fast_nj(max_joins=n_joins)
    assert len(nj.join_log) == n_joins
    # every join was between active nodes and produced an internal profile
    joined = set()
    for i, j in nj.join_log:
        assert i not in joined and j not in joined
        joined.add(i)
        joined.add(j)
    assert nj.tree.maxnode == n + n_joins
    # criterion trajectory: finite out-distances, positive self-weights
    new_nodes = np.arange(n, n + n_joins)
    assert np.isfinite(nj.out_distances[new_nodes]).all()
    assert (nj.selfweight[new_nodes] > 0).all()
    # internal-tier rows materialized (weights nonzero where joined)
    w = np.asarray(nj.prof.W)[nj.prof._phys(n): nj.prof._phys(n) + n_joins]
    assert (w.sum(axis=1) > 0).all()
