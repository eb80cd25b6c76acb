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


def _try_native_read(options):
    """Fast path: native FASTA parse + dedup straight to the unique code
    matrix (native/vft_native.cpp), skipping Python string churn.  Returns
    (names, unique_codes, Uniquify, tree_str) or None to fall back."""
    from .io import native

    path = options.in_file_name
    if not path or not native.available():
        return None
    try:
        with open(path, "rb") as f:
            head = f.read(2)
        if not head.startswith(b">"):
            return None
        parsed = native.parse_fasta_codes(path, options)
        if parsed is None:
            return None
        names, codes = parsed
        first_of = native.uniquify_codes(codes)
    except (ValueError, OSError):
        return None
    n = len(names)
    aln_next = [-1] * n
    aln_to_uniq = [-1] * n
    unique_first = []
    last_of = {}
    uniq_rows = []
    for i in range(n):
        fi = int(first_of[i])
        if fi == i:
            aln_to_uniq[i] = len(unique_first)
            unique_first.append(i)
            uniq_rows.append(i)
        else:
            aln_next[last_of[fi]] = i
            aln_to_uniq[i] = aln_to_uniq[fi]
        last_of[fi] = i
    unique = Uniquify(unique_seq=[None] * len(unique_first),
                      unique_first=unique_first, aln_next=aln_next,
                      aln_to_uniq=aln_to_uniq)
    return names, codes[np.array(uniq_rows)], unique


def _enable_compilation_cache():
    """Persist compiled XLA executables across processes (the remote TPU
    backend pays 20-40 s per fresh compile; the join loop touches dozens of
    pow2-padded shapes, so cold starts dominated setup time without this)."""
    import os

    import jax

    try:
        cache_dir = os.environ.get(
            "VFT_JAX_CACHE", os.path.expanduser("~/.cache/vft_jax_cache"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # noqa: BLE001 -- cache is an optimization only
        pass


def run_pipeline(options, input_fp, output_fp, log_fp=None):
    """The full inference pipeline.  With -n > 1, analyzes multiple
    alignments from the same (phylip) stream (ref main.cpp:89, "global
    bootstrap" use).  Returns the last alignment's NJ engine."""
    from .utils.trace import maybe_trace
    result = None
    with maybe_trace():   # VFT_TRACE=dir -> jax-profiler device trace
        for i_aln in range(options.n_align):
            if i_aln > 0:
                options.in_file_name = ""  # only the first read can use the native path
            result = _run_single(options, input_fp, output_fp, log_fp)
    return result


def _run_single(options, input_fp, output_fp, log_fp=None):
    import jax
    # multi-host init must precede the first backend-initializing call
    # (jax.default_backend() below)
    from .parallel.multihost import maybe_init_distributed
    maybe_init_distributed(options)
    # near-tie join/NNI decisions need full f32 matmul accumulation on TPU
    # (default is bfloat16 inputs); the Pallas kernels already run HIGHEST.
    jax.config.update("jax_default_matmul_precision", "highest")
    # The reference accumulates profile contractions in double even in float
    # mode (ref profileDist NeighbourJoining.tcc:1167-1190 declares `double
    # top, denom` over float profiles), and join-order determinism across
    # mesh shapes depends on it: f32 partial psums over different dp groupings
    # round differently and can flip near-tie joins.  On CPU we therefore
    # enable x64 so _accum_dtype() upcasts the contractions to f64 (stores
    # stay f32); on TPU (no native f64) multi-chip determinism is tier-2
    # equal-quality, not bit-exact -- see docs/PARITY.md.
    if jax.default_backend() == "cpu" and not jax.config.jax_enable_x64:
        jax.config.update("jax_enable_x64", True)
    # On accelerator backends the level-batched phases (the reference's
    # -threads mode, thread levels 1-4 re-expressed as batched device calls,
    # SURVEY.md section 2.4) are the native execution model: the serial
    # per-node paths pay a ~25 ms blocking sync per node on the remote TPU
    # tunnel.  `-threads 1` stays the single-worker semantics on CPU;
    # VFT_FORCE_SERIAL=1 forces it on accelerators too (debug/parity runs).
    import os as _os
    if (jax.default_backend() != "cpu" and options.threads == 1
            and _os.environ.get("VFT_FORCE_SERIAL") != "1"):
        if getattr(options, "threads_explicit", False):
            # honor an explicit -threads 1 (serial-deterministic tier), but
            # warn: every serial per-node step pays a blocking device sync
            print("Warning: -threads 1 on an accelerator backend uses the "
                  "serial host loop (slow); omit -threads for the batched "
                  "device path", file=log_fp or sys.stderr)
        else:
            options.threads = 8
            if options.use_tophits_2nd:
                # mirror derive_settings' multi-worker rule (ref
                # VeryFastTree.cpp: 2nd-level lists are single-thread-only),
                # which also keeps the run inside the device join epoch
                options.use_tophits_2nd = False
                print("Warning: 2nd-level top hits ignored in multi-worker "
                      "mode", file=log_fp or sys.stderr)
    _enable_compilation_cache()
    if options.mesh is None:
        from .parallel.mesh import mesh_from_options
        options.mesh = mesh_from_options(options)
    log = log_fp
    progress = ProgressReport(options.show_progress, options.verbose,
                              options.relative_progress)
    options.debug = Debug()

    native_read = None
    # -makematrix needs per-sequence (not uniquified) codes, so it takes the
    # Python read path; the native path returns the unique code matrix only.
    if not options.constraints_file and not options.make_matrix:
        native_read = _try_native_read(options)
    aln = None
    if native_read is not None:
        names, codes, unique = native_read
        progress.print("Read alignment (native parser)")
        from .io.alignment import Alignment as _Aln
        aln = _Aln(names=names, seqs=[], n_pos=codes.shape[1])
    else:
        aln = read_alignment(input_fp, options, log)
        if not aln.seqs:
            raise ValueError("No alignment sequences")
        progress.print("Read alignment")
        names = aln.names

    if len(set(names)) != len(names):
        seen = set()
        dup = next(n for n in names if n in seen or seen.add(n))
        raise ValueError(f"Non-unique name '{dup}' in the alignment")
    name_to_idx = {n: i for i, n in enumerate(names)}

    if options.make_matrix:
        # print the pairwise (log-corrected) distance matrix and stop
        # (ref printDistances NeighbourJoining.tcc:274-288)
        dmat, _ = build_models(options)
        all_codes = seqs_to_codes(aln.seqs, options, log)
        mm = NeighbourJoining(options, all_codes, dmat, None)
        _print_distances(mm, names, output_fp)
        return mm, None

    if native_read is None:
        unique = Uniquify.build(aln)
        progress.print("Identified unique sequences")
    cons = read_constraints(options, unique, name_to_idx, log)

    dmat, tmat = build_models(options)
    if native_read is None:
        codes = seqs_to_codes(unique.unique_seq, options, log)
    else:
        codes = native_read[1]
    nj = NeighbourJoining(options, codes, dmat, tmat, cons, log=log,
                          progress=progress, names=names)
    n_uniq = len(unique.unique_seq)

    # array-state checkpoint resume (SURVEY.md section 5.4): restores the
    # tree + both profile stores + rates mid-ML-phase, skipping NJ/ME replay
    resume = None
    import os as _os
    if options.checkpoint_file and _os.path.exists(options.checkpoint_file):
        from .engine.checkpoint import load_checkpoint
        resume = load_checkpoint(nj, options.checkpoint_file)
        progress.print("Resumed from checkpoint")
        if log is not None:
            print(f"Resumed from checkpoint {options.checkpoint_file} "
                  f"(phase {resume[0].get('phase')}, "
                  f"round {resume[0].get('round')})", file=log)
    elif options.intree_file and not options.intree_file.startswith("*"):
        with open(options.intree_file) as fp:
            text = fp.read()
        _load_intree(nj, text, name_to_idx, unique)
    elif aln.tree:
        _load_intree(nj, aln.tree, name_to_idx, unique)
    else:
        nj.fast_nj()
    progress.print("Initial topology complete")

    def log_tree(fmt, i):
        """Persist intermediate trees so long jobs can be restarted from
        -intree (ref logTree tcc:5516-5522, main.cpp:125-128)."""
        if options.log_file_name and log is not None:
            log.write((fmt % i if "%" in fmt else fmt) + "\t")
            log.write(print_newick(nj.tree, names, unique, False,
                                   options.double_precision, options.quote))
            log.write("\n")

    log_tree("NJ", 0)

    nni_to_do = options.nni if options.nni != -1 else \
        int(0.5 + 4.0 * math.log2(max(n_uniq, 2)))
    spr_remaining = options.spr
    ml_nni_to_do = options.ml_nni if options.ml_nni != -1 else \
        int(0.5 + 2.0 * math.log2(max(n_uniq, 2)))

    # --- ME NNI rounds interleaved with SPR (ref VeryFastTreeImpl.tcc:161-204)
    from .engine import spr_epoch
    if options.threads > 1:
        # level-batched NNI rounds (the reference's thread-level-2 analog)
        from .engine import batched
        from .engine import spr_batched
        do_nni_fn = batched.do_nni_batched
        run_spr_fn = spr_batched.run_spr_batched
    else:
        from .engine import spr as _spr_mod
        do_nni_fn = rearrange.do_nni
        run_spr_fn = _spr_mod.run_spr
    if spr_epoch.spr_epoch_supported(nj) and spr_epoch._use_spr_epoch():
        # device-resident SPR rounds (engine/spr_epoch.py): serial node
        # order (tier-1), zero blocking fetches inside a round.  Default on
        # accelerators; opt-in on CPU via VFT_SPR_EPOCH=1.
        run_spr_fn = spr_epoch.run_spr_epoch
    if resume is not None:
        nni_to_do = 0
        spr_remaining = 0
    if nni_to_do > 0 and n_uniq > 3:
        stats = rearrange.NNIStats.init(nj)
        converged = False
        for i in range(nni_to_do):
            if not converged:
                n_change, _ = do_nni_fn(nj, i, nni_to_do, False, stats)
                progress.print("ME NNI round %d of %d, %d changes", i + 1,
                               nni_to_do, n_change)
                log_tree("ME_NNI%d", i + 1)
                if n_change == 0:
                    converged = True
            if (spr_remaining > 0 and nni_to_do // (options.spr + 1) > 0
                    and (i + 1) % (nni_to_do // (options.spr + 1)) == 0):
                run_spr_fn(nj, options.spr - spr_remaining, options.spr)
                log_tree("ME_SPR%d", options.spr - spr_remaining + 1)
                spr_remaining -= 1
                converged = False
                stats = rearrange.NNIStats.init(nj)
    while spr_remaining > 0 and n_uniq > 3:
        run_spr_fn(nj, options.spr - spr_remaining, options.spr)
        log_tree("ME_SPR%d", options.spr - spr_remaining + 1)
        spr_remaining -= 1

    if resume is None:
        if options.threads > 1 or not options.bionj:
            # the level-batched path (one gathered distance dispatch for the
            # whole tree) is value-identical to the serial walk whenever the
            # ME up-profiles use the plain 0.5 average (-bionj off)
            from .engine import batched
            batched.update_branch_lengths_batched(nj)
        else:
            rearrange.update_branch_lengths(nj)
        log_tree("ME_Lengths", 0)
        total_len = nj.total_len()
        if options.verbose > 0 and log is not None:
            print(f"Total branch-length {total_len:.3f} after "
                  f"{progress.clock_diff():.2f} sec", file=log)

    split_count = None
    if ml_nni_to_do > 0 or options.ml_len:
        from .engine import ml as ml_mod
        split_count = ml_mod.run_ml_phase(nj, ml_nni_to_do, n_uniq, progress,
                                          log, log_tree, resume=resume)
    else:
        from .engine import supports
        if options.threads > 1:
            split_count = supports.test_splits_min_evo_batched(nj)
        else:
            split_count = supports.test_splits_min_evo(nj)
        if options.n_bootstrap > 0 and n_uniq > 3:
            if options.threads > 1:
                supports.reliability_nj_batched(nj)
            else:
                supports.reliability_nj(nj)

    show_support = options.n_bootstrap > 0
    newick = print_newick(nj.tree, names, unique, show_support,
                          options.double_precision, options.quote)
    output_fp.write(newick + "\n")
    progress.done()
    _report_stats(options, nj, split_count, len(names), n_uniq, ml_nni_to_do,
                  progress, log)
    return nj, split_count


def _report_stats(options, nj, sc, n_seq, n_uniq, ml_nni_to_do, progress, log):
    """Final stats block (ref VeryFastTreeImpl.tcc:403-465): runtime, split
    quality, and the debug-counter fingerprint of heuristic behavior."""
    if log is None:
        return
    ml_store = getattr(nj, "ml", None)
    if ml_store is not None:
        ml_store.flush_posterior_counters()
    d = nj.debug
    line = (f"Total time: {progress.clock_diff():.2f} seconds "
            f"Unique: {n_uniq}/{n_seq} "
            f"Bad splits: {sc.n_bad_splits if sc else 0}/{sc.n_splits if sc else 0}")
    if sc and sc.d_worst_delta_unconstrained > 0:
        kind = "LogLk" if (ml_nni_to_do > 0 or options.ml_len) else "Len"
        line += f" Worst delta-{kind} {sc.d_worst_delta_unconstrained:.3f}"
    print(line, file=log)
    if options.verbose > 1 or options.log_file_name:
        dn2 = max(n_uniq * float(n_uniq), 1.0)
        print(f"Dist/N**2: by-profile {d.profile_ops / dn2:.3f} "
              f"(out {d.outprofile_ops / dn2:.3f}) by-leaf {d.seq_ops / dn2:.3f} "
              f"avg-prof {d.profile_avg_ops / dn2:.3f}", file=log)
        if d.n_close_used or d.n_close2_used or d.n_refresh_tophits:
            print(f"Top hits: close neighbors {d.n_close_used}/{n_uniq} "
                  f"2nd-level {d.n_close2_used} refreshes {d.n_refresh_tophits}",
                  file=log)
        if not options.slow:
            print(f" Hill-climb: {d.n_hill_better} Update-best: {d.n_visible_update}",
                  file=log)
        print(f"NNI: {d.n_nni} SPR: {d.n_spr} ML-NNI: {d.n_ml_nni}", file=log)
        if ml_nni_to_do > 0:
            extra = ""
            if d.n_aa_posterior_exact or d.n_aa_posterior_rough:
                frac = 100.0 * d.n_aa_posterior_rough / max(
                    d.n_aa_posterior_exact + d.n_aa_posterior_rough, 1)
                extra += f" approximate-posteriors {frac:.2f}%"
            if options.ml_accuracy < 2:
                extra += f" star-only {d.n_star_tests}"
            print(f"Max-lk operations: lk {d.n_lk_compute} posterior "
                  f"{d.n_posterior_compute}{extra}", file=log)


def _print_distances(nj, names, out):
    """All-pairs leaf distances (ref printDistances tcc:274-288)."""
    n = nj.n_seqs
    for i in range(n):
        dist, _ = nj.prof.dist_one_vs_all(i)
        d = dist[:n]
        if nj.options.logdist:
            d = nj.log_corrected(d)
        out.write(names[i])
        for j in range(n):
            out.write(" %f" % max(d[j], 0.0))
        out.write("\n")


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
