"""Oracle parity tests for the maximum-likelihood phase: JC, JTT+CAT, GTR,
SH supports, Gamma20 (configs[1]/[2]-style, small)."""
import io
import re

import pytest

from util import have_oracle, rf_distance, run_oracle, simulate_alignment, write_fasta

pytestmark = pytest.mark.skipif(not have_oracle(), reason="reference oracle not built")


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


def _loglk_lines(text):
    out = []
    for line in text.splitlines():
        m = re.search(r"LogLk\s*=?\s*(-?\d+\.\d+)", line)
        if m and ("ML-NNI" in line or "Optimize all" in line):
            out.append(float(m.group(1)))
    return out


def test_ml_jc_parity(tmp_path):
    seqs = simulate_alignment(20, 150, seed=9)
    fasta = str(tmp_path / "t.fasta")
    write_fasta(fasta, seqs)
    nw_ref, err = run_oracle(["-nt", "-notop", "-spr", "0", "-nosupport"], fasta)
    nw_ours, log, _ = _run_ours(fasta, n_codes=4, tophits_mult=0.0, spr=0,
                                n_bootstrap=0)
    assert rf_distance(nw_ref, nw_ours)[0] == 0
    ref_ll = _loglk_lines(err)
    our_ll = _loglk_lines(log)
    assert len(ref_ll) == len(our_ll)
    for a, b in zip(ref_ll, our_ll):
        assert abs(a - b) < 0.05


def test_ml_protein_jtt_parity(tmp_path):
    seqs = simulate_alignment(15, 120, alphabet="ARNDCQEGHILKMFPSTWYV", seed=21)
    fasta = str(tmp_path / "t.fasta")
    write_fasta(fasta, seqs)
    nw_ref, err = run_oracle(["-notop", "-spr", "0", "-nosupport"], fasta)
    nw_ours, log, _ = _run_ours(fasta, n_codes=20, tophits_mult=0.0, spr=0,
                                n_bootstrap=0)
    assert rf_distance(nw_ref, nw_ours)[0] == 0
    for a, b in zip(_loglk_lines(err), _loglk_lines(log)):
        assert abs(a - b) < 0.05


def test_ml_protein_jtt_cat_midscale(tmp_path):
    """configs[1]-style protein JTT+CAT parity at N=300 with the FULL
    default pipeline (top-hits NJ + ME NNI/SPR + ML NNI + CAT): topology
    must match the oracle (RF == 0) and the final optimized LogLk agree
    to ~1e-4 relative (tier-2 quality, docs/PARITY.md)."""
    seqs = simulate_alignment(300, 300, alphabet="ARNDCQEGHILKMFPSTWYV",
                              seed=42)
    fasta = str(tmp_path / "t.fasta")
    write_fasta(fasta, seqs)
    nw_ref, err = run_oracle(["-nosupport"], fasta)
    nw_ours, log, _ = _run_ours(fasta, n_codes=20, n_bootstrap=0)
    assert rf_distance(nw_ref, nw_ours)[0] == 0
    ref_ll = [x for x in _loglk_lines(err)][-1]
    our_ll = [x for x in _loglk_lines(log)][-1]
    assert abs(ref_ll - our_ll) / abs(ref_ll) < 1e-4


def test_ml_gtr_parity(tmp_path):
    seqs = simulate_alignment(15, 150, seed=22)
    fasta = str(tmp_path / "t.fasta")
    write_fasta(fasta, seqs)
    nw_ref, err = run_oracle(["-nt", "-gtr", "-notop", "-spr", "0", "-nosupport"],
                             fasta)
    nw_ours, log, _ = _run_ours(fasta, n_codes=4, use_gtr=True, tophits_mult=0.0,
                                spr=0, n_bootstrap=0)
    assert rf_distance(nw_ref, nw_ours)[0] == 0
    for a, b in zip(_loglk_lines(err), _loglk_lines(log)):
        assert abs(a - b) < 0.05


def test_ml_sh_supports_and_gamma(tmp_path):
    seqs = simulate_alignment(15, 150, seed=31)
    fasta = str(tmp_path / "t.fasta")
    write_fasta(fasta, seqs)
    nw_ref, err = run_oracle(["-nt", "-notop", "-spr", "0", "-boot", "100",
                              "-gamma"], fasta)
    nw_ours, log, _ = _run_ours(fasta, n_codes=4, tophits_mult=0.0, spr=0,
                                n_bootstrap=100, gamma_loglk=True)
    assert rf_distance(nw_ref, nw_ours)[0] == 0
    sup_ref = [float(x) for x in re.findall(r"\)([0-9.]+):", nw_ref)]
    sup_ours = [float(x) for x in re.findall(r"\)([0-9.]+):", nw_ours)]
    assert len(sup_ref) == len(sup_ours)
    close = sum(1 for a, b in zip(sup_ref, sup_ours) if abs(a - b) <= 0.05)
    assert close >= len(sup_ref) - 2  # borderline splits may flip slightly
    m_ref = re.search(r"Gamma\(20\) LogLk = (-?\d+\.\d+) alpha = (\d+\.\d+)", err)
    m_our = re.search(r"Gamma\(20\) LogLk = (-?\d+\.\d+) alpha = (\d+\.\d+)", log)
    assert m_ref and m_our
    assert abs(float(m_ref.group(1)) - float(m_our.group(1))) < 0.1
    assert abs(float(m_ref.group(2)) - float(m_our.group(2))) < 0.05
