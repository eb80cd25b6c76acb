"""Array-state checkpointing (SURVEY.md section 5.4): a run interrupted
mid-ML-phase and resumed from the checkpoint produces the same tree as an
uninterrupted run; the checkpoint round-trips every engine array."""
import io

import numpy as np

from util import simulate_alignment, write_fasta


def _opts(ckpt="", **kw):
    from veryfasttree_tpu.options import Options

    o = Options(show_progress=False, n_codes=4, n_bootstrap=0,
                checkpoint_file=ckpt, **kw)
    o.derive_settings()
    return o


def _run(fasta, ckpt="", **kw):
    from veryfasttree_tpu.pipeline import run_pipeline

    out = io.StringIO()
    with open(fasta) as f:
        nj, _ = run_pipeline(_opts(ckpt, **kw), f, out, log_fp=None)
    return out.getvalue().strip(), nj


def test_checkpoint_roundtrip(tmp_path):
    from veryfasttree_tpu.engine.checkpoint import load_checkpoint, save_checkpoint

    fasta = str(tmp_path / "t.fasta")
    write_fasta(fasta, simulate_alignment(16, 120, seed=13))
    _, nj = _run(fasta)
    path = str(tmp_path / "state.npz")
    save_checkpoint(nj, path, {"phase": "test", "round": 3,
                               "last_loglk": -12.5, "converged": False},
                    extra={"foo": np.arange(4)})

    # fresh engine from the same alignment, then restore
    _, nj2 = _run(fasta, ml_nni=0, nni=0, spr=0)
    meta, extra = load_checkpoint(nj2, path)
    assert meta["phase"] == "test" and meta["round"] == 3
    assert (extra["foo"] == np.arange(4)).all()
    np.testing.assert_array_equal(nj2.tree.parent, nj.tree.parent)
    np.testing.assert_array_equal(nj2.tree.branchlength, nj.tree.branchlength)
    np.testing.assert_array_equal(np.asarray(nj2.prof.U), np.asarray(nj.prof.U))
    np.testing.assert_array_equal(np.asarray(nj2.ml.V), np.asarray(nj.ml.V))
    np.testing.assert_array_equal(nj2.ml.rates_np, nj.ml.rates_np)
    np.testing.assert_array_equal(nj2.ml.ratecat_np, nj.ml.ratecat_np)


def test_resume_mid_ml_matches_uninterrupted(tmp_path, monkeypatch):
    fasta = str(tmp_path / "t.fasta")
    write_fasta(fasta, simulate_alignment(18, 130, seed=14))
    rounds = 6

    # uninterrupted run
    nw_full, _ = _run(fasta, ml_nni=rounds)

    # "interrupted" run: kill the process (an exception) in ML-NNI round 3,
    # after the round-2 checkpoint was written
    from veryfasttree_tpu.engine import rearrange

    ckpt = str(tmp_path / "ck.npz")
    orig = rearrange.do_nni
    calls = {"ml": 0}

    def bomb(nj, i, total, use_ml, stats):
        if use_ml:
            calls["ml"] += 1
            if calls["ml"] == 3:
                raise KeyboardInterrupt("simulated crash mid-phase")
        return orig(nj, i, total, use_ml, stats)

    monkeypatch.setattr(rearrange, "do_nni", bomb)
    try:
        _run(fasta, ckpt=ckpt, ml_nni=rounds)
        raise AssertionError("bomb did not fire")
    except KeyboardInterrupt:
        pass
    monkeypatch.setattr(rearrange, "do_nni", orig)

    # resume from the round-2 checkpoint; same round budget
    nw_resumed, nj = _run(fasta, ckpt=ckpt, ml_nni=rounds)
    assert nw_resumed == nw_full
    # the resumed run really did skip ahead (it kept the checkpoint's rates)
    assert len(nj.ml.rates_np) > 1
