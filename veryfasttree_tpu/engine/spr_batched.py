"""Partitioned, lockstep-batched SPR rounds (thread-level-4 analog).

The reference parallelizes SPR by giving threads disjoint subtrees
(treePartitioning(maxSPRLength+1), ref tcc:6342-6401) with a boundary margin.
Here each subtree runs the same chain logic as the serial path
(engine/spr.py), written as a coroutine that *yields* its quartet-distance
requests; the driver gathers one pending request per active chain and
evaluates them in a single batched device call per lockstep round, so the
blocking device round-trip is amortized across all subtrees.  Profile repairs
(averages) stay per-worker but are enqueue-only (non-blocking).

A final serial pass covers nodes skipped at partition boundaries, as in the
reference (ref tcc:6403).
"""
from __future__ import annotations

import numpy as np

from . import rearrange
from .partition import tree_partitioning
from .rearrange import ABvsCD, ACvsBD, ADvsBC, QAB, QAC, QAD, QBC, QBD, QCD, UpProfiles
from .spr import SprStep, unwind_spr_step


def _corrected6_from(nj, dist, weight):
    weight = np.where(weight > 0, weight, 0.01)
    if nj.options.pseudo_weight > 0:
        pw = nj.options.pseudo_weight
        bottom = weight.sum()
        prior = (dist * weight).sum() / bottom if bottom > 0.01 else 3.0
        dist = (dist * weight + prior * pw) / (weight + pw)
    if nj.options.logdist:
        dist = nj.log_corrected(dist)
    return dist


def _choose_from6(nj, d, nodes4):
    if nj.n_cons:
        counts = [(nj.con_on[nd], nj.con_off[nd]) for nd in nodes4]
        penalty = rearrange.quartet_constraint_penalties(nj, counts)
    else:
        penalty = np.zeros(3)
    criteria = np.array([d[QAB] + d[QCD] + penalty[0],
                         d[QAC] + d[QBD] + penalty[1],
                         d[QAD] + d[QBC] + penalty[2]])
    choice = ABvsCD
    if criteria[ACvsBD] < criteria[ABvsCD] and criteria[ACvsBD] <= criteria[ADvsBC]:
        choice = ACvsBD
    elif criteria[ADvsBC] < criteria[ABvsCD] and criteria[ADvsBC] <= criteria[ACvsBD]:
        choice = ADvsBC
    return choice, criteria


def _spr_chain_gen(nj, ups, node_move, node_around, b_first_ac):
    """find_spr_steps as a coroutine: yields rows4 for the 6-pair distance
    evaluation, receives (dist, weight) (ref findSPRSteps tcc:1805-1858)."""
    tree = nj.tree
    steps = []
    for i_step in range(nj.options.max_spr_length):
        if tree.n_child[node_around] != 2:
            break
        rows4, nodes4 = rearrange.setup_abcd(nj, ups, node_around, use_ml=False)
        dist, weight = yield rows4
        d = _corrected6_from(nj, dist, weight)
        nj.debug.profile_ops += 6
        choice, criteria = _choose_from6(nj, d, nodes4)
        if (b_first_ac if i_step == 0 else criteria[ACvsBD] < criteria[ADvsBC]):
            step = SprStep((nodes4[1], nodes4[2]),
                           criteria[ACvsBD] - criteria[ABvsCD])
        else:
            step = SprStep((nodes4[0], nodes4[2]),
                           criteria[ADvsBC] - criteria[ABvsCD])
        steps.append(step)
        tree.replace_child(node_around, step.nodes[0], step.nodes[1])
        tree.replace_child(int(tree.parent[node_around]), step.nodes[1],
                           step.nodes[0])
        rearrange.update_for_nni(nj, ups, node_around, use_ml=False)
        new_around = [int(tree.parent[node_move]), tree.sibling(node_move)]
        if tree.parent[node_move] == tree.root:
            new_around = tree.root_siblings(node_move)
        node_around = new_around[1] if new_around[0] == node_around else new_around[0]
    return steps


def _worker_gen(nj, sub_root, processed):
    """traverseSPR over one subtree (ref tcc:6185-6313), as a coroutine."""
    tree = nj.tree
    opts = nj.options
    ups = UpProfiles(nj)
    # snapshot node list: postorder within the subtree, excluding nodes whose
    # parent chain reaches the subtree boundary within maxSPRLength+1 steps
    root_parent = int(tree.parent[sub_root])
    node_list = list(tree.postorder_nodes(sub_root))
    for node in node_list:
        if node == tree.root or node == sub_root:
            continue
        limit = int(tree.parent[node])
        reached = False
        for _ in range(opts.max_spr_length + 1):
            if limit == root_parent:
                reached = True
                break
            if limit < 0:
                break
            limit = int(tree.parent[limit])
        if reached:
            continue
        processed[node] = True
        node_around = [int(tree.parent[node]), tree.sibling(node)]
        if tree.parent[node] == tree.root:
            node_around = tree.root_siblings(node)
        b_changed = False
        for i_around in range(2):
            if b_changed:
                break
            for ac_first in (False, True):
                if b_changed:
                    break
                chain = _spr_chain_gen(nj, ups, node, node_around[i_around],
                                       ac_first)
                steps = None
                try:
                    req = next(chain)
                    while True:
                        result = yield req
                        req = chain.send(result)
                except StopIteration as fin:
                    steps = fin.value or []
                d_min = 0.0
                best = -1
                tot = 0.0
                for i_c, step in enumerate(steps):
                    tot += step.delta_length
                    if tot < d_min:
                        d_min = tot
                        best = i_c
                for i_c in range(len(steps) - 1, best, -1):
                    unwind_spr_step(nj, ups, steps[i_c])
                if best >= 0:
                    b_changed = True
        if b_changed:
            nj.debug.n_spr += 1
            ups.reset_all()
            ancestor = int(tree.parent[node])
            while ancestor >= 0 and ancestor != root_parent:
                rearrange.recompute_profile(nj, ups, ancestor, use_ml=False)
                ancestor = int(tree.parent[ancestor])


def run_spr_batched(nj, i_round: int, n_rounds: int) -> None:
    tree = nj.tree
    opts = nj.options
    if nj.n_seqs <= 3 or opts.max_spr_length < 1:
        return
    workers_n = max(opts.threads, 8)
    roots = tree_partitioning(nj, opts.max_spr_length + 1, workers=workers_n)
    processed = np.zeros(tree.maxnodes, dtype=bool)

    gens = []
    pending = []
    for r in roots:
        g = _worker_gen(nj, int(r), processed)
        try:
            pending.append(next(g))
            gens.append(g)
        except StopIteration:
            pass

    # lockstep: one batched 6-pair distance call per round across all chains
    while gens:
        pairs_i, pairs_j = [], []
        for rows4 in pending:
            for i, j in ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)):
                pairs_i.append(rows4[i])
                pairs_j.append(rows4[j])
        dist, weight = nj.prof.dist_pairs(np.array(pairs_i), np.array(pairs_j))
        next_gens, next_pending = [], []
        for k, g in enumerate(gens):
            d6 = dist[6 * k: 6 * k + 6]
            w6 = weight[6 * k: 6 * k + 6]
            try:
                req = g.send((d6, w6))
                next_gens.append(g)
                next_pending.append(req)
            except StopIteration:
                pass
        gens, pending = next_gens, next_pending

    # serial pass over everything the partitions skipped (ref tcc:6403)
    from . import spr as spr_serial
    ups = UpProfiles(nj)
    for node in list(tree.postorder_nodes()):
        if node == tree.root or processed[node]:
            continue
        node_around = [int(tree.parent[node]), tree.sibling(node)]
        if tree.parent[node] == tree.root:
            node_around = tree.root_siblings(node)
        b_changed = False
        for i_around in range(2):
            if b_changed:
                break
            for ac_first in (False, True):
                if b_changed:
                    break
                steps = spr_serial.find_spr_steps(nj, ups, node,
                                                  node_around[i_around], ac_first)
                d_min, best, tot = 0.0, -1, 0.0
                for i_c, step in enumerate(steps):
                    tot += step.delta_length
                    if tot < d_min:
                        d_min, best = tot, i_c
                for i_c in range(len(steps) - 1, best, -1):
                    unwind_spr_step(nj, ups, steps[i_c])
                if best >= 0:
                    b_changed = True
        if b_changed:
            nj.debug.n_spr += 1
            ups.reset_all()
            ancestor = int(tree.parent[node])
            while ancestor >= 0:
                rearrange.recompute_profile(nj, ups, ancestor, use_ml=False)
                ancestor = int(tree.parent[ancestor])
