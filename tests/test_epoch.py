"""Device join-epoch parity: engine/epoch.py vs the host join loop.

The epoch runs the ENTIRE fastNJ join phase (search, hill-climb, join,
top-hits merge/refresh, visible/top-visible upkeep, out-profile resets)
inside one `lax.while_loop` dispatch (ref NeighbourJoining.tcc:2796-3155).
The host loop is oracle-pinned (tests/test_default_parity.py), so epoch ==
host join-for-join implies oracle parity transitively.

N=300 exercises the periodic out-profile reset (n_reset_out_profile=200),
top-hits full refreshes with neighbor expansion, and top-visible resets.
"""
import io

import numpy as np
import pytest

from util import simulate_alignment, write_fasta


def _synth(n, p, seed):
    rng = np.random.default_rng(seed)
    n_f = max(4, n // 20)
    founders = rng.integers(0, 4, size=(n_f, p))
    rows = founders[rng.integers(0, n_f, size=n)]
    mut = rng.random((n, p)) < 0.1
    rows = np.where(mut, rng.integers(0, 4, size=(n, p)), rows)
    tag = ((np.arange(n)[:, None] >> np.arange(16)[None, :]) & 1).astype(rows.dtype)
    rows[:, -16:] = tag
    return rows.astype(np.int8)


def _run(codes, use_epoch, monkeypatch):
    from veryfasttree_tpu.engine.nj import NeighbourJoining
    from veryfasttree_tpu.options import Options

    monkeypatch.setenv("VFT_EPOCH", "1" if use_epoch else "0")
    opts = Options(n_codes=4, show_progress=False)
    opts.derive_settings()
    nj = NeighbourJoining(opts, codes, None, None)
    nj.fast_nj()
    return nj


@pytest.mark.parametrize("n,p,seed", [(120, 256, 3), (300, 300, 1)])
def test_epoch_join_sequence_identical(n, p, seed, monkeypatch):
    codes = _synth(n, p, seed)
    nj_h = _run(codes, False, monkeypatch)
    nj_e = _run(codes, True, monkeypatch)
    assert nj_e.join_log == nj_h.join_log
    bl_h = nj_h.tree.branchlength[: nj_h.tree.maxnode]
    bl_e = nj_e.tree.branchlength[: nj_e.tree.maxnode]
    assert np.max(np.abs(bl_h - bl_e)) < 1e-12
    # bookkeeping arrays drive later phases; they must round-trip too
    assert np.allclose(nj_h.diameter, nj_e.diameter, atol=1e-12)
    assert np.allclose(nj_h.out_distances, nj_e.out_distances, atol=1e-9)


def test_epoch_pipeline_newick_identical(tmp_path, monkeypatch):
    """Full -noml pipeline (NNI + SPR on top of the epoch-built tree)."""
    from veryfasttree_tpu.options import Options
    from veryfasttree_tpu.pipeline import run_pipeline

    seqs = simulate_alignment(100, 300, seed=77)
    fasta = str(tmp_path / "t.fasta")
    write_fasta(fasta, seqs)

    def run(use_epoch):
        monkeypatch.setenv("VFT_EPOCH", "1" if use_epoch else "0")
        opts = Options(show_progress=False, n_codes=4, ml_nni=0,
                       n_bootstrap=0)
        opts.derive_settings()
        out = io.StringIO()
        with open(fasta) as f:
            run_pipeline(opts, f, out)
        return out.getvalue().strip()

    assert run(True) == run(False)


def test_epoch_max_joins(monkeypatch):
    """The benchmark max_joins hook stops the epoch early."""
    codes = _synth(64, 128, 9)
    from veryfasttree_tpu.engine.nj import NeighbourJoining
    from veryfasttree_tpu.options import Options

    monkeypatch.setenv("VFT_EPOCH", "1")
    opts = Options(n_codes=4, show_progress=False)
    opts.derive_settings()
    nj = NeighbourJoining(opts, codes, None, None)
    nj.fast_nj(max_joins=10)
    assert len(nj.join_log) == 10


def test_epoch_constraints_identical(tmp_path, monkeypatch):
    """Constrained joins run inside the epoch (penalty in the criterion,
    ref joinConstraintPenalty tcc:559-605) and must match the host loop
    join-for-join, including the final Newick."""
    import io

    from veryfasttree_tpu.options import Options
    from veryfasttree_tpu.pipeline import run_pipeline

    seqs = simulate_alignment(60, 250, seed=21)
    fasta = str(tmp_path / "t.fasta")
    write_fasta(fasta, seqs)
    cons = tmp_path / "cons.fasta"
    with cons.open("w") as f:
        for i in range(60):
            f.write(f">seq{i:05d}\n{'1' if i % 3 == 0 else '0'}\n")

    def run(use_epoch):
        monkeypatch.setenv("VFT_EPOCH", "1" if use_epoch else "0")
        opts = Options(show_progress=False, n_codes=4, ml_nni=0,
                       n_bootstrap=0, constraints_file=str(cons))
        opts.derive_settings()
        out = io.StringIO()
        with open(fasta) as f:
            nj, _ = run_pipeline(opts, f, out)
        assert nj.n_cons == 1
        return out.getvalue().strip(), list(nj.join_log)

    nw_e, joins_e = run(True)
    nw_h, joins_h = run(False)
    assert joins_e == joins_h
    assert nw_e == nw_h
