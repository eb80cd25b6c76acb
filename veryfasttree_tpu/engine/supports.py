"""Split tests and support values.

* testSplitsMinEvo (ref tcc:6639-6797): count splits where an NNI would
  shorten the tree, using corrected quartet distances.
* reliabilityNJ / splitSupport (ref tcc:608-703, 3157-3237): minimum-evolution
  local bootstrap -- per-position weighted distance pieces for the 6 quartet
  pairs come back from the device as [6, P] arrays, and the nBootstrap column
  resamples are evaluated as one [6,P] x [P,B] matmul against resample count
  matrices (TPU-native replacement for the per-replicate position loops).
* resampleColumns (ref tcc:705-727): Knuth-stream column picks, bit-identical
  to the reference (which never seeds the generator, so the default 314159
  stream is used).
* SH supports for ML live in engine/ml.py.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..utils.knuth import KnuthRandom
from . import rearrange
from .rearrange import QAB, QAC, QAD, QBC, QBD, QCD, ABvsCD, ACvsBD, ADvsBC, UpProfiles


@dataclass
class SplitCount:
    """ref SplitCount NeighbourJoining.h:60-69"""
    n_bad_splits: int = 0
    n_constraint_violations: int = 0
    n_bad_both: int = 0
    n_splits: int = 0
    d_worst_delta_unconstrained: float = 0.0
    d_worst_delta_constrained: float = 0.0


def resample_columns(nj) -> np.ndarray:
    """col[iBoot, j] resampled position indices (ref resampleColumns tcc:705-727)."""
    rng = KnuthRandom()
    n_pos = nj.n_pos
    n_boot = nj.options.n_bootstrap
    col = np.empty((n_boot, n_pos), dtype=np.int64)
    for b in range(n_boot):
        for j in range(n_pos):
            pos = int(rng.next_double() * n_pos)
            col[b, j] = min(max(pos, 0), n_pos - 1)
    return col


def resample_count_matrix(col: np.ndarray, n_pos: int) -> np.ndarray:
    """[P, B] multiplicity matrix: counts[p, b] = #times position p drawn in b."""
    n_boot = col.shape[0]
    counts = np.zeros((n_pos, n_boot), dtype=np.float64)
    for b in range(n_boot):
        np.add.at(counts[:, b], col[b], 1.0)
    return counts


def split_violates_constraint(nj, nodes4, i_cons: int) -> bool:
    """ref splitViolatesConstraint tcc:1531-1563"""
    codes = []
    for nd in nodes4:
        on, off = nj.con_on[nd][i_cons], nj.con_off[nd][i_cons]
        if on + off == 0:
            return False
        codes.append(1 if (on > 0 and off == 0) else (0 if off > 0 and on == 0 else -1))
    n0 = codes.count(0)
    n1 = codes.count(1)
    if n0 >= 3 or n1 >= 3:
        return False
    if n0 == 2 and n1 == 2 and codes[0] == codes[1] and codes[2] == codes[3]:
        return False
    return True


def test_splits_min_evo(nj) -> SplitCount:
    """ref testSplitsMinEvo tcc:6639-6797"""
    sc = SplitCount()
    tree = nj.tree
    if nj.n_seqs <= 3:
        return sc
    tol = 1e-6
    ups = UpProfiles(nj)
    for node in tree.postorder_nodes():
        if node < nj.n_seqs or node == tree.root:
            continue
        rows4, nodes4 = rearrange.setup_abcd(nj, ups, node, use_ml=False)
        d = rearrange.corrected_pair_distances(nj, rows4, 4)
        s_ab_cd = d[QAB] + d[QCD]
        s_ac_bd = d[QAC] + d[QBD]
        s_ad_bc = d[QAD] + d[QBC]
        if nj.n_cons:
            counts = [(nj.con_on[nd], nj.con_off[nd]) for nd in nodes4]
            p = rearrange.quartet_constraint_penalties(nj, counts)
        else:
            p = np.zeros(3)
        n_violated = sum(split_violates_constraint(nj, nodes4, c)
                         for c in range(nj.n_cons))
        delta = s_ab_cd - min(s_ac_bd, s_ad_bc)
        bad_dist = delta > tol
        bad_constr = p[ABvsCD] > p[ACvsBD] + tol or p[ABvsCD] > p[ADvsBC] + tol
        sc.n_splits += 1
        if bad_dist:
            choice = ACvsBD if s_ac_bd < s_ad_bc else ADvsBC
            if p[choice] > p[ABvsCD] + tol:
                sc.d_worst_delta_constrained = max(delta, sc.d_worst_delta_constrained)
            else:
                sc.d_worst_delta_unconstrained = max(delta, sc.d_worst_delta_unconstrained)
        if n_violated > 0:
            sc.n_constraint_violations += 1
        if bad_dist:
            sc.n_bad_splits += 1
        if bad_dist and bad_constr:
            sc.n_bad_both += 1
        ups.reset(nodes4[0])
        ups.reset(nodes4[1])
    return sc


def test_splits_min_evo_batched(nj) -> SplitCount:
    """Level-batched testSplitsMinEvo (ref tcc:6639-6797): up-profiles
    computed levelwise (balanced 0.5 averages, the batched-tier semantics of
    engine/batched.py), then ALL quartets' 6 corrected pair distances in one
    gathered dispatch; every counter decision on host numpy.  The serial
    per-node walk pays one blocking device fetch per internal node (~60 s at
    N=2000 on the remote-TPU tunnel) for what is a single batched scan."""
    from . import batched

    sc = SplitCount()
    tree = nj.tree
    if nj.n_seqs <= 3:
        return sc
    tol = 1e-6
    batched.compute_up_profiles_levelwise(nj, use_ml=False)
    candidates = [n for n in range(nj.n_seqs, tree.maxnode)
                  if n != tree.root and tree.parent[n] >= 0
                  and tree.n_child[n] == 2]
    if not candidates:
        return sc
    rows, nodes4 = batched._gather_quartets(nj, candidates, use_ml=False)
    K = len(candidates)
    pair_idx = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    iis = np.concatenate([rows[:, i] for i, _ in pair_idx])
    jjs = np.concatenate([rows[:, j] for _, j in pair_idx])
    dist, weight = nj.prof.dist_pairs(iis, jjs)
    nj.debug.profile_ops += len(iis)
    dist = dist.reshape(6, K)
    weight = np.where(weight > 0, weight, 0.01).reshape(6, K)
    if nj.options.pseudo_weight > 0:
        bottom = weight.sum(axis=0)
        prior = np.where(bottom > 0.01,
                         (dist * weight).sum(axis=0) / bottom, 3.0)
        pw = nj.options.pseudo_weight
        dist = (dist * weight + prior[None, :] * pw) / (weight + pw)
    if nj.options.logdist:
        dist = nj.log_corrected(dist)
    for k in range(K):
        d = dist[:, k]
        s_ab_cd = d[QAB] + d[QCD]
        s_ac_bd = d[QAC] + d[QBD]
        s_ad_bc = d[QAD] + d[QBC]
        if nj.n_cons:
            counts = [(nj.con_on[nd], nj.con_off[nd]) for nd in nodes4[k]]
            p = rearrange.quartet_constraint_penalties(nj, counts)
        else:
            p = np.zeros(3)
        n_violated = sum(split_violates_constraint(nj, nodes4[k], c)
                         for c in range(nj.n_cons))
        delta = s_ab_cd - min(s_ac_bd, s_ad_bc)
        bad_dist = delta > tol
        bad_constr = p[ABvsCD] > p[ACvsBD] + tol or p[ABvsCD] > p[ADvsBC] + tol
        sc.n_splits += 1
        if bad_dist:
            choice = ACvsBD if s_ac_bd < s_ad_bc else ADvsBC
            if p[choice] > p[ABvsCD] + tol:
                sc.d_worst_delta_constrained = max(
                    delta, sc.d_worst_delta_constrained)
            else:
                sc.d_worst_delta_unconstrained = max(
                    delta, sc.d_worst_delta_unconstrained)
        if n_violated > 0:
            sc.n_constraint_violations += 1
        if bad_dist:
            sc.n_bad_splits += 1
        if bad_dist and bad_constr:
            sc.n_bad_both += 1
    return sc


def split_support(nj, rows4, counts_pb: np.ndarray) -> float:
    """ME local-bootstrap support for (A,B)|(C,D) (ref splitSupport tcc:608-703).

    counts_pb: [P, B] resample multiplicities.
    """
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    iis = np.array([rows4[i] for i, _ in pairs])
    jjs = np.array([rows4[j] for _, j in pairs])
    distpieces, weights = nj.prof.dist_pieces_pairs(iis, jjs)  # [6, P] each

    def dists_from(totp, totw):
        d = np.where(totw > 0.01, totp / np.where(totw > 0.01, totw, 1.0), 3.0)
        if nj.options.logdist:
            d = nj.log_corrected(d)
        return d

    dists = dists_from(distpieces.sum(axis=1), weights.sum(axis=1))
    support1 = dists[QAC] + dists[QBD] - dists[QAB] - dists[QCD]
    support2 = dists[QAD] + dists[QBC] - dists[QAB] - dists[QCD]
    if support1 < 0 or support2 < 0:
        nj.debug.n_suboptimal_splits += 1

    totp = distpieces @ counts_pb   # [6, B]
    totw = weights @ counts_pb
    d = np.where(totw > 0.01, totp / np.where(totw > 0.01, totw, 1.0), 3.0)
    if nj.options.logdist:
        d = nj.log_corrected(d)
    s1 = d[QAC] + d[QBD] - d[QAB] - d[QCD]
    s2 = d[QAD] + d[QBC] - d[QAB] - d[QCD]
    n_support = int(((s1 > 0) & (s2 > 0)).sum())
    return n_support / counts_pb.shape[1]


def reliability_nj(nj) -> None:
    """ME local bootstrap over all internal splits (ref reliabilityNJ tcc:3191-3238)."""
    if nj.n_seqs <= 3 or nj.options.n_bootstrap <= 0:
        return
    col = resample_columns(nj)
    counts = resample_count_matrix(col, nj.n_pos)
    tree = nj.tree
    ups = UpProfiles(nj)
    for node in tree.postorder_nodes():
        if node < nj.n_seqs or node == tree.root:
            continue
        rows4, nodes4 = rearrange.setup_abcd(nj, ups, node, use_ml=False)
        tree.support[node] = split_support(nj, rows4, counts)
        for nd in nodes4[:3]:
            ups.reset(nd)


def reliability_nj_batched(nj) -> None:
    """Level-batched reliabilityNJ: up-profiles levelwise (batched-tier 0.5
    averages), then ALL quartets' per-position distance pieces in one
    gathered dispatch and the bootstrap resampling as one [6K,P] x [P,B]
    matmul block -- the serial walk pays a blocking fetch per node."""
    from . import batched

    if nj.n_seqs <= 3 or nj.options.n_bootstrap <= 0:
        return
    col = resample_columns(nj)
    counts = resample_count_matrix(col, nj.n_pos)     # [P, B]
    tree = nj.tree
    batched.compute_up_profiles_levelwise(nj, use_ml=False)
    candidates = [n for n in range(nj.n_seqs, tree.maxnode)
                  if n != tree.root and tree.parent[n] >= 0
                  and tree.n_child[n] == 2]
    if not candidates:
        return
    rows, _ = batched._gather_quartets(nj, candidates, use_ml=False)
    K = len(candidates)
    pair_idx = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    iis = np.concatenate([rows[:, i] for i, _ in pair_idx])
    jjs = np.concatenate([rows[:, j] for _, j in pair_idx])
    pieces, weights = nj.prof.dist_pieces_pairs(iis, jjs)   # [6K, P]
    pieces = pieces.reshape(6, K, -1)
    weights = weights.reshape(6, K, -1)

    def dists_from(totp, totw):
        d = np.where(totw > 0.01, totp / np.where(totw > 0.01, totw, 1.0), 3.0)
        if nj.options.logdist:
            d = nj.log_corrected(d)
        return d

    dists = dists_from(pieces.sum(axis=2), weights.sum(axis=2))   # [6, K]
    sup1 = dists[QAC] + dists[QBD] - dists[QAB] - dists[QCD]
    sup2 = dists[QAD] + dists[QBC] - dists[QAB] - dists[QCD]
    nj.debug.n_suboptimal_splits += int(((sup1 < 0) | (sup2 < 0)).sum())

    totp = np.einsum("qkp,pb->qkb", pieces, counts)
    totw = np.einsum("qkp,pb->qkb", weights, counts)
    d = dists_from(totp, totw)                                    # [6, K, B]
    s1 = d[QAC] + d[QBD] - d[QAB] - d[QCD]
    s2 = d[QAD] + d[QBC] - d[QAB] - d[QCD]
    n_support = ((s1 > 0) & (s2 > 0)).sum(axis=1)                 # [K]
    for k, node in enumerate(candidates):
        tree.support[node] = n_support[k] / counts.shape[1]
