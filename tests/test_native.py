"""Native C++ runtime components vs pure-Python equivalence."""
import numpy as np
import pytest

from util import simulate_alignment, write_fasta

from veryfasttree_tpu.io import native
from veryfasttree_tpu.io.alignment import Uniquify, Alignment, read_alignment, seqs_to_codes
from veryfasttree_tpu.options import Options

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built (make -C native)")


def test_native_fasta_matches_python(tmp_path):
    seqs = simulate_alignment(30, 200, seed=5, gap_frac=0.05)
    fasta = str(tmp_path / "t.fasta")
    write_fasta(fasta, seqs)
    opts = Options(n_codes=4)
    opts.derive_settings()
    with open(fasta) as f:
        aln = read_alignment(f, opts)
    codes_py = seqs_to_codes(aln.seqs, opts)
    names_nat, codes_nat = native.parse_fasta_codes(fasta, opts)
    assert names_nat == aln.names
    assert codes_nat.shape == codes_py.shape
    assert (codes_nat == codes_py).all()


def test_native_uniquify_matches_python(tmp_path):
    seqs = simulate_alignment(20, 100, seed=6)
    seqs = seqs + seqs[:7]  # duplicates
    opts = Options(n_codes=4)
    opts.derive_settings()
    codes = seqs_to_codes(seqs, opts)
    first_of = native.uniquify_codes(codes)
    aln = Alignment(names=[f"s{i}" for i in range(len(seqs))], seqs=seqs,
                    n_pos=len(seqs[0]))
    uniq = Uniquify.build(aln)
    # python Uniquify: aln_to_uniq maps to unique index; native: first index
    for i in range(len(seqs)):
        iu = uniq.aln_to_uniq[i]
        assert first_of[i] == uniq.unique_first[iu]
