"""End-to-end pipeline: alignment -> tree (ref VeryFastTreeImpl.tcc:46-472).

Sequences all phases: read + uniquify -> profiles -> NJ -> ME NNI/SPR rounds ->
ME branch lengths -> [ML phase: profile switch, ML lengths / NNIs, rates,
supports] -> Newick.
"""
from __future__ import annotations

import math
import sys

import numpy as np

from . import constants
from .engine import rearrange
from .engine.nj import NeighbourJoining
from .engine.state import TreeState
from .io.alignment import Uniquify, read_alignment, seqs_to_codes
from .io.newick import parse_newick, print_newick
from .models.distance_matrix import DistanceMatrix
from .models.transition_matrix import TransitionMatrix
from .utils.debug import Debug
from .utils.progress import ProgressReport


def build_models(options):
    dmat = None
    if options.matrix_prefix:
        dmat = DistanceMatrix.from_files(options.matrix_prefix, options)
    elif options.use_matrix:
        assert options.n_codes == 20
        dmat = DistanceMatrix.blosum45()
    tmat = None
    if options.n_codes == 20:
        if options.transition_file:
            tmat = TransitionMatrix.from_file(options.transition_file)
        elif options.use_lg:
            tmat = TransitionMatrix.lg08()
        elif options.use_wag:
            tmat = TransitionMatrix.wag01()
        else:
            tmat = TransitionMatrix.jtt92()
    elif options.n_codes == 4 and options.use_gtr and (options.use_gtr_rates
                                                       or options.use_gtr_freq):
        tmat = TransitionMatrix.gtr(options.gtr_rates, options.gtr_freq)
    return dmat, tmat


def read_constraints(options, unique, name_to_idx, log):
    """Map a constraints alignment into unique-sequence (nOn, nOff) counts
    (ref alnToConstraints VeryFastTreeImpl.tcc:474-515)."""
    if not options.constraints_file:
        return None
    from .io.alignment import open_maybe_compressed
    with open_maybe_compressed(options.constraints_file) as fp:
        caln = read_alignment(fp, options, log)
    if len(caln.seqs) < 4:
        print("Warning: constraints file with less than 4 sequences ignored",
              file=log or sys.stderr)
        return None
    n_cons = caln.n_pos
    n_uniq = len(unique.unique_seq)
    on = np.zeros((n_uniq, n_cons), dtype=np.int64)
    off = np.zeros((n_uniq, n_cons), dtype=np.int64)
    seen = {}
    for name, seq in zip(caln.names, caln.seqs):
        if name not in name_to_idx:
            raise ValueError(f"Sequence {name} from constraints file is not in "
                             "the alignment")
        iu = unique.aln_to_uniq[name_to_idx[name]]
        if iu in seen:
            if seen[iu] != seq and log is not None:
                print(f"Warning: ignoring constraints for {name}", file=log)
            continue
        seen[iu] = seq
        for c, ch in enumerate(seq):
            if ch == "1":
                on[iu, c] = 1
            elif ch == "0":
                off[iu, c] = 1
    return on, off


def run_pipeline(options, input_fp, output_fp, log_fp=None):
    """The full inference pipeline.  Returns the NJ engine (for inspection)."""
    log = log_fp
    progress = ProgressReport(options.show_progress, options.verbose,
                              options.relative_progress)
    options.debug = Debug()
    aln = read_alignment(input_fp, options, log)
    if not aln.seqs:
        raise ValueError("No alignment sequences")
    progress.print("Read alignment")

    names = aln.names
    if len(set(names)) != len(names):
        dup = [n for n in names if names.count(n) > 1][0]
        raise ValueError(f"Non-unique name '{dup}' in the alignment")
    name_to_idx = {n: i for i, n in enumerate(names)}

    unique = Uniquify.build(aln)
    progress.print("Identified unique sequences")
    cons = read_constraints(options, unique, name_to_idx, log)

    dmat, tmat = build_models(options)
    codes = seqs_to_codes(unique.unique_seq, options, log)
    nj = NeighbourJoining(options, codes, dmat, tmat, cons, log=log,
                          progress=progress, names=names)
    n_uniq = len(unique.unique_seq)

    if options.intree_file and not options.intree_file.startswith("*"):
        with open(options.intree_file) as fp:
            text = fp.read()
        _load_intree(nj, text, name_to_idx, unique)
    elif aln.tree:
        _load_intree(nj, aln.tree, name_to_idx, unique)
    else:
        nj.fast_nj()
    progress.print("Initial topology complete")

    nni_to_do = options.nni if options.nni != -1 else \
        int(0.5 + 4.0 * math.log2(max(n_uniq, 2)))
    spr_remaining = options.spr
    ml_nni_to_do = options.ml_nni if options.ml_nni != -1 else \
        int(0.5 + 2.0 * math.log2(max(n_uniq, 2)))

    # --- ME NNI rounds interleaved with SPR (ref VeryFastTreeImpl.tcc:161-204)
    if nni_to_do > 0 and n_uniq > 3:
        stats = rearrange.NNIStats.init(nj)
        converged = False
        for i in range(nni_to_do):
            if not converged:
                n_change, _ = rearrange.do_nni(nj, i, nni_to_do, False, stats)
                progress.print("ME NNI round %d of %d, %d changes", i + 1,
                               nni_to_do, n_change)
                if n_change == 0:
                    converged = True
            if (spr_remaining > 0 and nni_to_do // (options.spr + 1) > 0
                    and (i + 1) % (nni_to_do // (options.spr + 1)) == 0):
                from .engine import spr as spr_mod
                spr_mod.run_spr(nj, options.spr - spr_remaining, options.spr)
                spr_remaining -= 1
                converged = False
                stats = rearrange.NNIStats.init(nj)
    while spr_remaining > 0 and n_uniq > 3:
        from .engine import spr as spr_mod
        spr_mod.run_spr(nj, options.spr - spr_remaining, options.spr)
        spr_remaining -= 1

    rearrange.update_branch_lengths(nj)
    total_len = nj.total_len()
    if options.verbose > 0 and log is not None:
        print(f"Total branch-length {total_len:.3f} after {progress.clock_diff():.2f} sec",
              file=log)

    split_count = None
    if ml_nni_to_do > 0 or options.ml_len:
        from .engine import ml as ml_mod
        split_count = ml_mod.run_ml_phase(nj, ml_nni_to_do, n_uniq, progress, log)
    else:
        from .engine import supports
        split_count = supports.test_splits_min_evo(nj)
        if options.n_bootstrap > 0 and n_uniq > 3:
            supports.reliability_nj(nj)

    show_support = options.n_bootstrap > 0
    newick = print_newick(nj.tree, names, unique, show_support,
                          options.double_precision, options.quote)
    output_fp.write(newick + "\n")
    progress.done()
    return nj, split_count


def _load_intree(nj, text, name_to_idx, unique):
    """Read a starting tree + compute balanced profiles (ref readTree)."""
    parent, children, root, n_used = parse_newick(text, name_to_idx, unique)
    tree = nj.tree
    tree.root = root
    tree.maxnode = n_used
    for node in range(n_used):
        tree.parent[node] = parent[node]
        kids = children[node]
        tree.n_child[node] = len(kids)
        tree.children[node, :] = -1
        for k, c in enumerate(kids):
            tree.children[node, k] = c
    rearrange.recompute_profiles_levelwise(nj)
