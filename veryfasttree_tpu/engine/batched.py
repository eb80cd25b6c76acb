"""Level-batched tree rearrangements: the TPU-native form of the reference's
relaxed thread-parallel modes.

The reference parallelizes NNI rounds by giving threads disjoint subtrees
(treePartitioning, thread level 2, ref tcc:6108-6165) and branch-length
optimization / tree traversals by level (levels 1/3, ref README.md:150-158),
explicitly accepting that traversal-order changes perturb results slightly.
On TPU the natural unit is a whole tree level: every internal node's quartet
is evaluated in ONE batched device call (vmapped over nodes), swaps are applied
host-side with conflict skipping, and profiles are re-averaged bottom-up one
level per call.  Semantics match the reference's parallel modes, not its
serial order -- enable via threads > 1 (like the reference) or on TPU.

Used when `options.threads > 1`; the serial path (engine/rearrange.py)
reproduces the reference's single-thread order bit-for-bit.
"""
from __future__ import annotations

import numpy as np

from .. import constants
from . import rearrange
from .rearrange import ABvsCD, ACvsBD, ADvsBC, NNIStats, QAB, QAC, QAD, QBC, QBD, QCD


def compute_up_profiles_levelwise(nj, use_ml: bool) -> np.ndarray:
    """Compute ALL up-profiles top-down, one batched call per level.

    up[node] = profile of "everything above node" = combine(C, D) where C is
    node's sibling and D is up[parent] (or the other root sibling).  Returns
    the array of up-row indices (maxnodes + node).
    """
    tree = nj.tree
    levels = tree.level_lists()
    triples = []
    for level in reversed(levels):  # top-down
        nodes = [int(n) for n in level
                 if n != tree.root and n >= nj.n_seqs and tree.n_child[n] == 2]
        if not nodes:
            continue
        r1s, r2s, l1s, l2s, targets = [], [], [], [], []
        for node in nodes:
            par = int(tree.parent[node])
            if par == tree.root:
                sibs = tree.root_siblings(node)
                c_row, d_row = sibs[0], sibs[1]
                len_c, len_d = tree.branchlength[sibs[0]], tree.branchlength[sibs[1]]
            else:
                c_row = tree.sibling(node)
                d_row = nj.ml.up_row(par) if use_ml else nj.prof.up_row(par)
                len_c = tree.branchlength[c_row]
                len_d = tree.branchlength[par]
            targets.append(nj.ml.up_row(node) if use_ml else nj.prof.up_row(node))
            r1s.append(c_row)
            r2s.append(d_row)
            l1s.append(len_c)
            l2s.append(len_d)
        if use_ml:
            # ML up-profile: posterior of (C, D) (ref getUpProfile tcc:3404-3419)
            triples.append((targets, r1s, r2s, l1s, l2s))
        else:
            triples.append((targets, r1s, r2s))
    if not triples:
        return
    if use_ml:
        nj.ml.posterior_sweep(triples)
    else:
        nj.prof.average_sweep(triples)


def _gather_quartets(nj, nodes, use_ml: bool):
    """rows4 + nodes4 for a batch of internal nodes (up-profiles precomputed)."""
    tree = nj.tree
    rows = np.zeros((len(nodes), 4), dtype=np.int64)
    nodes4 = np.zeros((len(nodes), 4), dtype=np.int64)
    for k, node in enumerate(nodes):
        a, b = int(tree.children[node, 0]), int(tree.children[node, 1])
        par = int(tree.parent[node])
        if par == tree.root:
            sibs = tree.root_siblings(node)
            c, d = sibs
            d_row = d
        else:
            c = tree.sibling(node)
            d = par
            d_row = nj.ml.up_row(par) if use_ml else nj.prof.up_row(par)
        rows[k] = [a, b, c, d_row]
        nodes4[k] = [a, b, c, d]
    return rows, nodes4


def do_nni_batched(nj, i_round: int, n_rounds: int, use_ml: bool,
                   stats: NNIStats):
    """One NNI round with level-batched quartet evaluation."""
    tree = nj.tree
    opts = nj.options
    if nj.n_seqs <= 3:
        return 0, 0.0
    support_threshold = constants.TREE_LOGLK_DELTA if use_ml else opts.me_min_delta

    compute_up_profiles_levelwise(nj, use_ml)

    # candidate nodes: all internal non-root, minus the fastNNI skip set
    candidates = []
    for node in range(nj.n_seqs, tree.maxnode):
        if node == tree.root or tree.parent[node] < 0 or tree.n_child[node] != 2:
            continue
        if opts.fast_nni and (stats.age[node] >= 2 and stats.subtree_age[node] >= 2
                              and stats.support[node] > support_threshold):
            _, nodes4 = rearrange.setup_abcd(nj, None, node, use_ml, rows=False)
            if all(not (stats.age[nd] == 0 and stats.support[nd] > support_threshold)
                   for nd in nodes4):
                continue
        candidates.append(node)
    if not candidates:
        return 0, 0.0

    rows, nodes4 = _gather_quartets(nj, candidates, use_ml)
    if use_ml:
        lengths = np.stack([
            tree.branchlength[nodes4[:, 0]], tree.branchlength[nodes4[:, 1]],
            tree.branchlength[nodes4[:, 2]], tree.branchlength[nodes4[:, 3]],
            tree.branchlength[np.array(candidates)]], axis=1)
        choice, criteria, new_len = nj.ml.quartet_nni_rows(rows, lengths)
    else:
        # 6 corrected pair distances per node, one batched device call
        K = len(candidates)
        pair_idx = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
        iis = np.concatenate([rows[:, i] for i, _ in pair_idx])
        jjs = np.concatenate([rows[:, j] for _, j in pair_idx])
        dist, weight = nj.prof.dist_pairs(iis, jjs)
        nj.debug.profile_ops += len(iis)
        dist = dist.reshape(6, K)
        weight = np.where(weight > 0, weight, 0.01).reshape(6, K)
        if opts.pseudo_weight > 0:
            bottom = weight.sum(axis=0)
            prior = np.where(bottom > 0.01, (dist * weight).sum(axis=0) / bottom, 3.0)
            pw = opts.pseudo_weight
            dist = (dist * weight + prior[None, :] * pw) / (weight + pw)
        if opts.logdist:
            dist = nj.log_corrected(dist)
        pen = np.zeros((3, K))
        if nj.n_cons:
            for k in range(K):
                counts = [(nj.con_on[nd], nj.con_off[nd]) for nd in nodes4[k]]
                pen[:, k] = rearrange.quartet_constraint_penalties(nj, counts)
        criteria = np.stack([dist[QAB] + dist[QCD] + pen[0],
                             dist[QAC] + dist[QBD] + pen[1],
                             dist[QAD] + dist[QBC] + pen[2]], axis=1)
        choice = np.full(K, ABvsCD)
        better_ac = (criteria[:, ACvsBD] < criteria[:, ABvsCD]) \
            & (criteria[:, ACvsBD] <= criteria[:, ADvsBC])
        better_ad = (criteria[:, ADvsBC] < criteria[:, ABvsCD]) \
            & (criteria[:, ADvsBC] <= criteria[:, ACvsBD]) & ~better_ac
        choice = np.where(better_ac, ACvsBD, np.where(better_ad, ADvsBC, ABvsCD))
        criteria = -criteria  # higher is better, as in ML
        new_len = None

    # apply swaps host-side, postorder order, skipping conflicts
    n_nni = 0
    d_max_delta = 0.0
    touched = np.zeros(tree.maxnodes, dtype=bool)
    LEN_A, LEN_B, LEN_C, LEN_D, LEN_I = range(5)
    for k, node in enumerate(candidates):
        ch = int(choice[k])
        a, b, c, d = (int(x) for x in nodes4[k])
        neighborhood = [node, a, b, c, d, int(tree.parent[node])]
        crit = criteria[k]
        delta = crit[ch] - crit[ABvsCD]
        if ch != ABvsCD and not any(touched[n] for n in neighborhood):
            if ch == ACvsBD:
                tree.replace_child(node, b, c)
                tree.replace_child(int(tree.parent[node]), c, b)
            else:
                tree.replace_child(node, a, c)
                tree.replace_child(int(tree.parent[node]), c, a)
            if use_ml and new_len is not None:
                nl = new_len[k].copy()
                if ch == ADvsBC:
                    nl = np.array([nl[LEN_C], nl[LEN_D], nl[LEN_A], nl[LEN_B],
                                   nl[LEN_I]])
                    nl[LEN_A], nl[LEN_C] = nl[LEN_C], nl[LEN_A]
                elif ch == ACvsBD:
                    nl[LEN_B], nl[LEN_C] = nl[LEN_C], nl[LEN_B]
                tree.branchlength[node] = nl[LEN_I]
                tree.branchlength[a] = nl[LEN_A]
                tree.branchlength[b] = nl[LEN_B]
                tree.branchlength[c] = nl[LEN_C]
                tree.branchlength[d] = nl[LEN_D]
            for n in neighborhood:
                touched[n] = True
            for nd in [node, a, b, c, d]:
                stats.age[nd] = 0
            n_nni += 1
            if use_ml:
                nj.debug.n_ml_nni += 1
            else:
                nj.debug.n_nni += 1
        else:
            stats.age[node] += 1
        stats.delta[node] = delta
        d_max_delta = max(d_max_delta, delta)
        stats.support[node] = min(crit[ch] - crit[kk] for kk in range(3) if kk != ch)
        if stats.delta[node] > support_threshold:
            stats.subtree_age[node] = 0
        else:
            stats.subtree_age[node] += 1
            for kk in range(2):
                child = int(tree.children[node, kk])
                stats.subtree_age[node] = min(stats.subtree_age[node],
                                              stats.subtree_age[child])

    # repair all internal profiles bottom-up, one batched call per level
    if use_ml:
        nj.ml.recompute_ml_profiles()
    else:
        rearrange.recompute_profiles_levelwise(nj)
    return n_nni, d_max_delta


def optimize_all_branch_lengths_batched(nj) -> None:
    """Level-batched ML branch-length optimization (thread-level-3 analog,
    ref optimizeAllBranchLengths tcc:5006-5111): for every internal node of a
    level, run the 2x3 Brent sweeps with each branch's line search vmapped
    across the level in one device call."""
    tree = nj.tree
    ml = nj.ml
    if nj.n_seqs < 2:
        return
    if nj.n_seqs == 2:
        from .ml import ml_pair_optimize
        a, b = int(tree.children[tree.root, 0]), int(tree.children[tree.root, 1])
        _, ln = ml_pair_optimize(nj, a, b, 1.0)
        tree.branchlength[a] = ln / 2.0
        tree.branchlength[b] = ln / 2.0
        return
    compute_up_profiles_levelwise(nj, use_ml=True)
    # branch lengths ride the device through the whole sweep: every Brent
    # result scatters into `bl` and feeds the next posterior enqueue-only;
    # the single blocking fetch happens after the last level (the per-level
    # fetches here were ~6 x levels x 25 ms on the axon tunnel).  All eager
    # device ops (bl gathers/scatters) use pow2-BUCKETED index arrays:
    # exact level sizes change every round, and unbucketed eager ops each
    # pay a persistent-compilation-cache disk read instead of an in-memory
    # hit (the 6 s/round ME-NNI finding).  Padding lanes read bl's extra
    # slot / write their own scratch rows and scatter-drop.
    import jax.numpy as jnp

    from .profiles import _pad_pow2
    from .ml_profiles import S_TMP2
    bl = jnp.asarray(
        np.concatenate([tree.branchlength[: tree.maxnodes], [0.1]]),
        dtype=ml.dtype)
    for level in tree.level_lists():
        nodes = [int(n) for n in level if tree.n_child[n] >= 2]
        if not nodes:
            continue
        nodes3 = []
        rows3 = []
        for node in nodes:
            n_child = int(tree.n_child[node])
            nds = [int(tree.children[node, 0]), int(tree.children[node, 1]),
                   int(tree.children[node, 2]) if n_child == 3 else node]
            rws = [nds[0], nds[1],
                   nds[2] if n_child == 3 else ml.up_row(node)]
            nodes3.append(nds)
            rows3.append(rws)
        n = len(nodes)
        npad = max(1, 1 << (n - 1).bit_length())
        pad3 = np.zeros((npad - n, 3), dtype=np.int64)
        nodes3 = np.concatenate([np.array(nodes3, dtype=np.int64),
                                 pad3 + tree.maxnodes])  # read bl's extra slot
        rows3 = np.concatenate([np.array(rows3, dtype=np.int64), pad3])
        tgt3 = nodes3  # pad lanes point at maxnodes = the droppable slot
        scratch = ml.scratch_rows_for(npad)
        for _ in range(2):
            for i in range(3):
                b1, b2 = (i + 1) % 3, (i + 2) % 3
                ml.posterior_rows(scratch, rows3[:, b1], rows3[:, b2],
                                  bl[nodes3[:, b1]], bl[nodes3[:, b2]])
                guesses = jnp.maximum(bl[nodes3[:, i]],
                                      ml.dtype(nj.options.ml_min_branch_length))
                xs, _ = ml.opt_branch_length_rows(rows3[:, i], scratch,
                                                  guesses, fetch=False)
                bl = bl.at[tgt3[:, i]].set(xs.astype(ml.dtype))
        # refresh this level's profiles for the next level up
        upd = [nd for nd in nodes if nd != tree.root]
        if upd:
            upad, _ = _pad_pow2(np.asarray(upd, dtype=np.int64),
                                fill=ml.scratch_row(S_TMP2))
            ipad, _ = _pad_pow2(np.array(
                [int(tree.children[nd, 0]) for nd in upd], dtype=np.int64))
            jpad, _ = _pad_pow2(np.array(
                [int(tree.children[nd, 1]) for nd in upd], dtype=np.int64))
            nj.ml.posterior_rows(upad, ipad, jpad, bl[ipad], bl[jpad])
    tree.branchlength[: tree.maxnodes] = \
        np.asarray(bl, dtype=np.float64)[:-1]


def update_branch_lengths_batched(nj) -> None:
    """ME branch lengths for ALL nodes in one batched distance call
    (thread-level-1 analog of ref updateBranchLengths tcc:6502-6598)."""
    tree = nj.tree
    if nj.n_seqs < 2:
        return
    if nj.n_seqs == 2:
        rearrange.update_branch_lengths(nj)
        return
    compute_up_profiles_levelwise(nj, use_ml=False)
    leaf_nodes, leaf_rows = [], []
    int_nodes, int_rows = [], []
    for node in range(tree.maxnode):
        if node == tree.root or tree.parent[node] < 0:
            continue
        if node < nj.n_seqs:
            sib = tree.sibling(node)
            if sib == -1:
                sibs = tree.root_siblings(node)
                rows3 = [node, sibs[0], sibs[1]]
            else:
                rows3 = [node, sib, nj.prof.up_row(int(tree.parent[node]))]
            leaf_nodes.append(node)
            leaf_rows.append(rows3)
        elif tree.n_child[node] == 2:
            a, b = int(tree.children[node, 0]), int(tree.children[node, 1])
            par = int(tree.parent[node])
            if par == tree.root:
                sibs = tree.root_siblings(node)
                rows4 = [a, b, sibs[0], sibs[1]]
            else:
                rows4 = [a, b, tree.sibling(node), nj.prof.up_row(par)]
            int_nodes.append(node)
            int_rows.append(rows4)

    iis, jjs = [], []
    for rows3 in leaf_rows:  # AB, AC, BC
        for i, j in ((0, 1), (0, 2), (1, 2)):
            iis.append(rows3[i])
            jjs.append(rows3[j])
    for rows4 in int_rows:   # AB, AC, AD, BC, BD, CD
        for i, j in ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)):
            iis.append(rows4[i])
            jjs.append(rows4[j])
    if not iis:
        return
    dist, weight = nj.prof.dist_pairs(np.array(iis), np.array(jjs))
    dist = np.array(dist)  # dist_pairs may return a read-only device view
    nj.debug.profile_ops += len(iis)
    weight = np.where(weight > 0, weight, 0.01)
    if nj.options.pseudo_weight > 0:
        # per-node prior over its own pair group (ref correctedPairDistances)
        pw = nj.options.pseudo_weight
        off = 0
        for group in ([3] * len(leaf_nodes) + [6] * len(int_nodes)):
            d = dist[off:off + group]
            w = weight[off:off + group]
            bottom = w.sum()
            prior = (d * w).sum() / bottom if bottom > 0.01 else 3.0
            dist[off:off + group] = (d * w + prior * pw) / (w + pw)
            off += group
    if nj.options.logdist:
        dist = nj.log_corrected(dist)
    off = 0
    for node in leaf_nodes:
        d = dist[off:off + 3]
        tree.branchlength[node] = (d[0] + d[1] - d[2]) / 2.0
        off += 3
    for node in int_nodes:
        d = dist[off:off + 6]
        tree.branchlength[node] = (d[1] + d[2] + d[3] + d[4]) / 4.0 \
            - (d[0] + d[5]) / 2.0
        off += 6


def tree_length_batched(nj, recompute_profiles: bool) -> float:
    if recompute_profiles:
        rearrange.recompute_profiles_levelwise(nj)
    update_branch_lengths_batched(nj)
    return float(nj.tree.branchlength[: nj.tree.maxnode].sum())


def test_splits_ml_batched(nj, progress=None):
    """Batched ML split testing incl. SH-like supports: the three topology
    log-likelihoods + per-site log-lks per split via one vmapped device
    dispatch chain, then the bootstrap resampling as numpy matmuls
    (thread-level analog of ref testSplitsML tcc:6800-6999 + SHSupport
    :1126-1164).  The serial path pays ~30 dispatches with ~8 blocking
    fetches per internal node."""
    from .ml import sh_support
    from .supports import SplitCount, resample_columns, \
        resample_count_matrix, split_violates_constraint
    from . import rearrange as _re

    sc = SplitCount()
    opts = nj.options
    tree = nj.tree
    if nj.n_seqs <= 3:
        return sc
    tol = 1e-6
    counts_pb = None
    if opts.n_bootstrap > 0:
        col = resample_columns(nj)
        counts_pb = resample_count_matrix(col, nj.n_pos)
    compute_up_profiles_levelwise(nj, use_ml=True)
    candidates = [n for n in range(nj.n_seqs, tree.maxnode)
                  if n != tree.root and tree.parent[n] >= 0
                  and tree.n_child[n] == 2]
    if not candidates:
        return sc
    rows, nodes4 = _gather_quartets(nj, candidates, use_ml=True)
    lengths = np.stack([
        tree.branchlength[nodes4[:, 0]], tree.branchlength[nodes4[:, 1]],
        tree.branchlength[nodes4[:, 2]], tree.branchlength[nodes4[:, 3]],
        tree.branchlength[np.array(candidates)]], axis=1)
    loglk, site = nj.ml.quartet_split_rows(rows, lengths)
    sc.n_splits = len(candidates)
    for k, node in enumerate(candidates):
        ll = loglk[k]
        if ll[ABvsCD] >= ll[ACvsBD] and ll[ABvsCD] >= ll[ADvsBC]:
            choice = ABvsCD
        elif ll[ACvsBD] >= ll[ABvsCD] and ll[ACvsBD] >= ll[ADvsBC]:
            choice = ACvsBD
        else:
            choice = ADvsBC
        bad_split = ll[choice] > ll[ABvsCD] + constants.TREE_LOGLK_DELTA
        if nj.n_cons:
            pcounts = [(nj.con_on[nd], nj.con_off[nd]) for nd in nodes4[k]]
            p = _re.quartet_constraint_penalties(nj, pcounts)
        else:
            p = np.zeros(3)
        bad_constr = p[ABvsCD] > p[ACvsBD] + tol or p[ABvsCD] > p[ADvsBC] + tol
        if any(split_violates_constraint(nj, nodes4[k], c)
               for c in range(nj.n_cons)):
            sc.n_constraint_violations += 1
        if bad_split:
            sc.n_bad_splits += 1
            delta = ll[choice] - ll[ABvsCD]
            if p[choice] > p[ABvsCD] + tol:
                sc.d_worst_delta_constrained = max(
                    delta, sc.d_worst_delta_constrained)
            else:
                sc.d_worst_delta_unconstrained = max(
                    delta, sc.d_worst_delta_unconstrained)
        if bad_split and bad_constr:
            sc.n_bad_both += 1
        if opts.n_bootstrap > 0:
            tree.support[node] = 0.0 if bad_split else sh_support(
                nj, ll, site[k], counts_pb)
    return sc
