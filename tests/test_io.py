"""IO tests: FASTQ / PHYLIP / NEXUS parsers, compressed input, Newick
round-trip, -intree."""
import gzip
import io

import numpy as np
import pytest

from util import have_oracle, rf_distance, run_oracle, simulate_alignment, write_fasta

from veryfasttree_tpu.options import Options
from veryfasttree_tpu.io.alignment import open_maybe_compressed, read_alignment


def _opts(**kw):
    o = Options(**kw)
    o.derive_settings()
    return o


def test_fastq():
    text = "@read1\nACGTACGT\n+\nIIIIIIII\n@read2\nACGTTCGT\n+\nIIIIIIII\n"
    aln = read_alignment(io.StringIO(text), _opts(n_codes=4))
    assert aln.names == ["read1", "read2"]
    assert aln.seqs == ["ACGTACGT", "ACGTTCGT"]


def test_phylip_interleaved():
    text = ("2 12\n"
            "alpha  ACGTAC\n"
            "beta   ACGTTC\n"
            "\n"
            "       GTACGT\n"
            "       GTACGA\n")
    aln = read_alignment(io.StringIO(text), _opts(n_codes=4))
    assert aln.names == ["alpha", "beta"]
    assert aln.seqs == ["ACGTACGTACGT", "ACGTTCGTACGA"]


def test_nexus():
    text = ("#NEXUS\n"
            "begin data;\n"
            "  dimensions ntax=2 nchar=8;\n"
            "  format gap=- matchchar=.;\n"
            "  matrix\n"
            "    taxon1 ACGTACGT\n"
            "    taxon2 AC.TTC.T\n"
            "  ;\n"
            "end;\n")
    aln = read_alignment(io.StringIO(text), _opts(n_codes=4))
    assert aln.names == ["taxon1", "taxon2"]
    assert aln.seqs[0] == "ACGTACGT"
    assert aln.seqs[1] == "ACGTTCGT"  # matchchar copies from the row above


def test_gzip_input(tmp_path):
    seqs = simulate_alignment(6, 50, seed=1)
    plain = tmp_path / "a.fasta"
    write_fasta(str(plain), seqs)
    gz = tmp_path / "a.fasta.gz"
    with gzip.open(gz, "wt") as f:
        f.write(plain.read_text())
    with open_maybe_compressed(str(gz)) as f:
        aln = read_alignment(f, _opts(n_codes=4))
    assert len(aln.seqs) == 6


@pytest.mark.skipif(not have_oracle(), reason="oracle not built")
def test_makematrix_duplicates(tmp_path):
    """-makematrix must print the FULL matrix (all sequences, not uniquified)
    even when the file-input native fast path is available and the alignment
    has duplicate sequences (ref printDistances runs pre-Uniquify,
    VeryFastTreeImpl.tcc:66-73)."""
    from veryfasttree_tpu.pipeline import run_pipeline

    seqs = simulate_alignment(12, 80, seed=3)
    seqs = seqs + seqs[:4]  # duplicates
    fasta = str(tmp_path / "m.fasta")
    write_fasta(fasta, seqs)
    opts = _opts(n_codes=4, make_matrix=True, show_progress=False,
                 in_file_name=fasta)
    out = io.StringIO()
    with open(fasta) as f:
        run_pipeline(opts, f, out)
    ours = out.getvalue().strip().splitlines()
    ref, _ = run_oracle(["-nt", "-makematrix"], fasta)
    ref_lines = ref.strip().splitlines()
    assert len(ours) == len(seqs)
    for lo, lr in zip(ours, ref_lines):
        po, pr = lo.split(), lr.split()
        assert po[0] == pr[0]
        # reference rounds dist to float before logCorrect/printf; allow 1 ulp
        # in the printed 6th decimal
        assert np.allclose([float(x) for x in po[1:]],
                           [float(x) for x in pr[1:]], atol=2e-6)


@pytest.mark.skipif(not have_oracle(), reason="oracle not built")
def test_intree_restart(tmp_path):
    """Tree-as-checkpoint: feed our own NJ tree back via -intree and refine;
    reference does the same (ref main.cpp:125-128)."""
    from veryfasttree_tpu.pipeline import run_pipeline

    seqs = simulate_alignment(25, 200, seed=13)
    fasta = str(tmp_path / "t.fasta")
    write_fasta(fasta, seqs)
    opts = _opts(n_codes=4, tophits_mult=0.0, spr=0, ml_nni=0, n_bootstrap=0,
                 show_progress=False)
    out = io.StringIO()
    with open(fasta) as f:
        run_pipeline(opts, f, out)
    tree1 = out.getvalue().strip()
    intree = tmp_path / "start.nwk"
    intree.write_text(tree1 + "\n")

    opts2 = _opts(n_codes=4, tophits_mult=0.0, spr=0, ml_nni=0, n_bootstrap=0,
                  show_progress=False, intree_file=str(intree))
    out2 = io.StringIO()
    with open(fasta) as f:
        run_pipeline(opts2, f, out2)
    tree2 = out2.getvalue().strip()
    rf, _ = rf_distance(tree1, tree2)
    assert rf == 0  # refinement from the converged tree keeps the topology
