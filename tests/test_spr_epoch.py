"""Device SPR-epoch parity: engine/spr_epoch.py vs the host serial SPR.

The host serial path (engine/spr.py) is oracle-pinned
(tests/test_default_parity.py includes SPR in the bit-identical -noml
Newick), so device == host node-for-node implies oracle parity
transitively.  The device round must reproduce the tree arrays AND the
profile store (node rows) bit-for-bit, because later phases (branch
lengths, ML) read both.
"""
import io

import numpy as np
import pytest

from util import simulate_alignment, write_fasta


def _build_nj(codes, opts_kw=None):
    from veryfasttree_tpu.engine.nj import NeighbourJoining
    from veryfasttree_tpu.options import Options

    opts = Options(n_codes=4, show_progress=False, **(opts_kw or {}))
    opts.derive_settings()
    nj = NeighbourJoining(opts, codes, None, None)
    nj.fast_nj()
    return nj


def _synth(n, p, seed):
    rng = np.random.default_rng(seed)
    n_f = max(4, n // 15)
    founders = rng.integers(0, 4, size=(n_f, p))
    rows = founders[rng.integers(0, n_f, size=n)]
    mut = rng.random((n, p)) < 0.12
    rows = np.where(mut, rng.integers(0, 4, size=(n, p)), rows)
    tag = ((np.arange(n)[:, None] >> np.arange(16)[None, :]) & 1).astype(rows.dtype)
    rows[:, -16:] = tag
    return rows.astype(np.int8)


@pytest.mark.parametrize("n,p,seed,kw", [
    (80, 256, 5, {}),
    (150, 300, 2, {}),
    (100, 256, 8, {"bionj": True}),
])
def test_spr_epoch_matches_host(n, p, seed, kw):
    """Default mode: tree AND store bit-identical.  -bionj: the quartet
    weight goes through log1p, where numpy (host) and XLA (device) differ
    at ulp level -- topology must still match at this N; the store is
    allclose (equal-quality tier, see spr_epoch module docstring)."""
    from veryfasttree_tpu.engine import spr as spr_host
    from veryfasttree_tpu.engine import spr_epoch
    from veryfasttree_tpu.engine.profiles import fetch_np

    codes = _synth(n, p, seed)

    nj_h = _build_nj(codes, kw)
    spr_host.run_spr(nj_h, 0, 2)

    nj_e = _build_nj(codes, kw)
    spr_epoch.run_spr_epoch(nj_e, 0, 2)

    np.testing.assert_array_equal(nj_h.tree.parent, nj_e.tree.parent)
    np.testing.assert_array_equal(nj_h.tree.children, nj_e.tree.children)
    np.testing.assert_array_equal(nj_h.tree.n_child, nj_e.tree.n_child)
    assert nj_h.debug.n_spr == nj_e.debug.n_spr

    # the NODE profile rows feed every later phase: require bit identity
    # (default) or 1e-6 closeness (-bionj, log1p ulp divergence)
    mh = nj_h.tree.maxnode
    ch = fetch_np(nj_h.prof.codes)[:mh]
    ce = fetch_np(nj_e.prof.codes)[:mh]
    np.testing.assert_array_equal(ch, ce)
    wh = fetch_np(nj_h.prof.W)[:mh]
    we = fetch_np(nj_e.prof.W)[:mh]
    uh = fetch_np(nj_h.prof.U)[:mh]
    ue = fetch_np(nj_e.prof.U)[:mh]
    if kw.get("bionj"):
        np.testing.assert_allclose(wh, we, atol=1e-6)
        np.testing.assert_allclose(uh, ue, atol=1e-6)
    else:
        np.testing.assert_array_equal(wh, we)
        np.testing.assert_array_equal(uh, ue)


def test_spr_epoch_two_rounds_sequential():
    """A second round starts from the first round's device-merged store."""
    from veryfasttree_tpu.engine import spr as spr_host
    from veryfasttree_tpu.engine import spr_epoch

    codes = _synth(90, 200, 3)
    nj_h = _build_nj(codes)
    spr_host.run_spr(nj_h, 0, 2)
    spr_host.run_spr(nj_h, 1, 2)

    nj_e = _build_nj(codes)
    spr_epoch.run_spr_epoch(nj_e, 0, 2)
    spr_epoch.run_spr_epoch(nj_e, 1, 2)

    np.testing.assert_array_equal(nj_h.tree.parent, nj_e.tree.parent)
    np.testing.assert_array_equal(nj_h.tree.children, nj_e.tree.children)


def test_spr_epoch_pipeline_newick_identical(tmp_path, monkeypatch):
    """Full -noml pipeline with the SPR epoch == host pipeline, byte-equal."""
    from veryfasttree_tpu.options import Options
    from veryfasttree_tpu.pipeline import run_pipeline

    seqs = simulate_alignment(80, 300, seed=31)
    fasta = str(tmp_path / "t.fasta")
    write_fasta(fasta, seqs)

    def run(use_epoch):
        monkeypatch.setenv("VFT_SPR_EPOCH", "1" if use_epoch else "0")
        opts = Options(show_progress=False, n_codes=4, ml_nni=0,
                       n_bootstrap=0)
        opts.derive_settings()
        out = io.StringIO()
        with open(fasta) as f:
            run_pipeline(opts, f, out)
        return out.getvalue().strip()

    assert run(True) == run(False)


def test_spr_epoch_constraints_identical(tmp_path, monkeypatch):
    """Constraint quartet penalties inside the SPR chains (ref
    quartetConstraintPenalties tcc:1490-1522) match the host."""
    from veryfasttree_tpu.engine import spr as spr_host
    from veryfasttree_tpu.engine import spr_epoch
    from veryfasttree_tpu.engine.nj import NeighbourJoining
    from veryfasttree_tpu.io.alignment import Uniquify, read_alignment, seqs_to_codes
    from veryfasttree_tpu.options import Options

    seqs = simulate_alignment(50, 250, seed=13)
    fasta = str(tmp_path / "t.fasta")
    write_fasta(fasta, seqs)

    def build():
        opts = Options(n_codes=4, show_progress=False)
        opts.derive_settings()
        with open(fasta) as f:
            aln = read_alignment(f, opts)
        uniq = Uniquify.build(aln)
        codes = seqs_to_codes(uniq.unique_seq, opts)
        n = codes.shape[0]
        con = np.array([[1 if i % 3 == 0 else 0] for i in range(n)])
        on = con
        off = 1 - con
        nj = NeighbourJoining(opts, codes, None, None,
                              constraint_on_off=(on, off))
        nj.fast_nj()
        return nj

    nj_h = build()
    spr_host.run_spr(nj_h, 0, 2)
    nj_e = build()
    spr_epoch.run_spr_epoch(nj_e, 0, 2)
    np.testing.assert_array_equal(nj_h.tree.parent, nj_e.tree.parent)
    np.testing.assert_array_equal(nj_h.tree.children, nj_e.tree.children)
    np.testing.assert_array_equal(nj_h.con_on, nj_e.con_on)


def test_spr_epoch_lanes4_quality(monkeypatch):
    """The vmapped 4-lane chain mode (batched tier) must match the serial
    device path's tree QUALITY: same accepted-move count within a few and
    ME tree length within 0.1%."""
    import numpy as np

    from veryfasttree_tpu.engine import rearrange, spr_epoch
    from veryfasttree_tpu.engine import batched

    codes = _synth(150, 300, 2)

    def run(lanes):
        monkeypatch.setenv("VFT_SPR_LANES4", "1" if lanes else "0")
        nj = _build_nj(codes)
        spr_epoch.run_spr_epoch(nj, 0, 2)
        batched.update_branch_lengths_batched(nj)
        tl = float(np.abs(nj.tree.branchlength[: nj.tree.maxnode]).sum())
        return nj.debug.n_spr, tl

    n1, tl1 = run(False)
    n2, tl2 = run(True)
    assert abs(tl1 - tl2) < 0.001 * tl1, (tl1, tl2)
    assert abs(n1 - n2) <= max(2, n1 // 5), (n1, n2)
