"""Top-hits heuristic: O(N*sqrt(N)) neighbor-joining candidate maintenance.

Re-creation of the reference machinery (ref setAllLeafTopHits tcc:3746-4124,
topHitNJSearch :4137-4298, getBestFromTopHits :4267-4298, topHitJoin
:4306-4533, sortSaveBestHits :4535-4578, transfer/unique :4580-4833, visible
set :4635-4784) in the deterministic serial order, with every distance
evaluation batched on device:

* a seed's one-vs-all scan is one [M, P*C] matvec (nj.set_best_hit),
* a close neighbor inherits the seed's top-2m list and re-evaluates all 2m
  candidate distances in a single gathered pair-distance call,
* top-hit list merges at joins re-evaluate the combined ~2m candidates in one
  batched call.

Hit lists, ages, and the visible/top-visible sets are small host-side arrays,
exactly as the reference keeps them.
"""
from __future__ import annotations

import math

import numpy as np

from typing import NamedTuple

from .nj import Besthit


class JoinPlan(NamedTuple):
    """Host-side decisions of topHitJoin made before any device work."""
    c0: int
    c1: int
    cand: np.ndarray
    b_use: bool
    b_second: bool
    age_new: int


class TopHits:
    def __init__(self, options, maxnodes: int, m: int):
        self.options = options
        self.m = m
        self.q = int(0.5 + options.tophits2_mult * math.sqrt(m))
        if not options.use_tophits_2nd or self.q >= m:
            self.q = 0
        self.maxnodes = maxnodes
        # per-node hit lists: (j indices, raw dists)
        self.hits_j = [None] * maxnodes     # np.int64 arrays
        self.hits_dist = [None] * maxnodes  # np.float64 arrays
        self.hit_source = np.full(maxnodes, -1, dtype=np.int64)
        self.age = np.zeros(maxnodes, dtype=np.int64)
        self.visible_j = np.full(maxnodes, -1, dtype=np.int64)
        self.visible_dist = np.full(maxnodes, 1e20)
        n_top_visible = int(0.5 + options.topvisible_mult * m)
        self.topvisible = np.full(n_top_visible, -1, dtype=np.int64)
        self.topvisible_age = 0

    # ---------------------------------------------------------------- helpers
    def _sort_save(self, nj, i_node: int, jjs, dists, crits, n_out: int,
                   presorted: bool = False) -> None:
        """sortSaveBestHits (ref tcc:4535-4578): stable-sort by criterion,
        dedupe js, drop self/invalid, keep n_out."""
        jjs = np.asarray(jjs)
        dists = np.asarray(dists)
        if not presorted:
            order = np.argsort(crits, kind="stable")
            jjs = jjs[order]
            dists = dists[order]
        keep_j = []
        keep_d = []
        seen = set()
        for j, d in zip(jjs, dists):
            if len(keep_j) >= n_out:
                break
            j = int(j)
            if j < 0 or j == i_node or j in seen:
                continue
            seen.add(j)
            keep_j.append(j)
            keep_d.append(d)
        assert keep_j
        self.hits_j[i_node] = np.array(keep_j, dtype=np.int64)
        self.hits_dist[i_node] = np.array(keep_d)

    def get_visible_batch(self, nj, n_active: int, nodes):
        """Batched getVisible: criteria for many nodes' visible entries in one
        device call.  Returns dict node -> Besthit (absent if invalid).
        Identical results to per-node get_visible: out-distance refreshes
        commute (each node's refresh decision is independent)."""
        tree = nj.tree
        valid = []
        for i_node in nodes:
            i_node = int(i_node)
            if i_node < 0 or tree.parent[i_node] >= 0:
                continue
            j = int(self.visible_j[i_node])
            if j < 0 or tree.parent[j] >= 0:
                continue
            valid.append((i_node, j, float(self.visible_dist[i_node])))
        if not valid:
            return {}
        iis = np.array([v[0] for v in valid])
        jjs = np.array([v[1] for v in valid])
        dists = np.array([v[2] for v in valid])
        crits = nj.set_criterion_batch(n_active, iis, jjs, dists)
        return {int(i): Besthit(int(i), int(j), -1.0, float(d), float(c))
                for (i, j, d), c in zip(valid, crits)}

    def get_visible(self, nj, n_active: int, i_node: int):
        """ref getVisible tcc:546-557: criterion-refreshed visible entry or None."""
        if i_node < 0 or nj.tree.parent[i_node] >= 0:
            return None
        j = int(self.visible_j[i_node])
        if j < 0 or nj.tree.parent[j] >= 0:
            return None
        dist = float(self.visible_dist[i_node])
        crit = float(nj.set_criterion_batch(n_active, [i_node], [j], [dist])[0])
        return Besthit(i_node, j, -1.0, dist, crit)

    # ------------------------------------------------------------- init phase
    def set_all_leaf_tophits(self, nj) -> None:
        """ref setAllLeafTopHits tcc:3746-4124 (serial deterministic order)."""
        opts = self.options
        n_seqs = nj.n_seqs
        m, q = self.m, self.q
        close = opts.tophits_close
        if close < 0:
            if opts.fastest and n_seqs >= 50000:
                close = 0.99
            else:
                log_n = math.log2(n_seqs)
                close = log_n / (log_n + 2.0)

        n_gaps = np.rint(nj.n_pos - nj.selfweight[:n_seqs]).astype(np.int64)
        # seeds sorted by (fewer gaps, smaller out-distance), stable
        seeds = np.lexsort((nj.out_distances[:n_seqs], n_gaps))
        assert 2 * m <= n_seqs
        visited = np.zeros(n_seqs, dtype=bool)

        # Wave-batched seed scans: the next K unvisited seeds (in seed order)
        # are scanned against all leaves in ONE dispatch; processing stays in
        # strict seed order, and a wave member that an earlier member claims
        # as a close neighbor gets its scan discarded -- exactly the serial
        # outcome (the discarded scan was never observable).  K adapts to the
        # discard rate so clustered data does not waste scan bandwidth.
        # device top-k fast path: the init host logic only reads the best
        # 2m+2 candidates per seed, so fetch just those (the full [K, N]
        # row fetch was ~50 MB/wave at N=100k over the ~30 MB/s tunnel).
        # Valid while all leaf out-distances are fresh at n_active == n_seqs
        # and unconstrained (best_hit_arrays reduces to the plain criterion).
        k_top = 2 * m + 2
        use_topk = (nj.n_cons == 0 and k_top < n_seqs
                    and (nj.n_out_dist_active[:n_seqs] == n_seqs).all())

        seed_pos = 0
        wave_k = 8
        while seed_pos < len(seeds):
            wave = []
            while seed_pos < len(seeds) and len(wave) < wave_k:
                s = int(seeds[seed_pos])
                seed_pos += 1
                if not visited[s]:
                    wave.append(s)
            if not wave:
                break
            if use_topk:
                idx_w, dist_w, weight_w = nj.prof.dist_leaves_topk(
                    np.array(wave), nj.out_distances[:n_seqs], k_top)
            else:
                dist_w, weight_w = nj.prof.dist_many_vs_leaves(np.array(wave))
            n_disc = 0
            transfers = []   # (node, cand) close-neighbor list fills
            for k, seed in enumerate(wave):
                if visited[seed]:
                    n_disc += 1
                    continue
                visited[seed] = True
                topk = (idx_w[k], dist_w[k], weight_w[k]) if use_topk else None
                self._process_seed(nj, seed, dist_w[k], weight_w[k], n_seqs,
                                   m, q, close, n_gaps, visited,
                                   transfers=transfers, topk=topk)
            # Close-neighbor transfers batch across the WHOLE wave: the
            # accept decisions depend only on each seed's own scan plus the
            # `visited` claims (updated serially above), never on transfer
            # RESULTS, so evaluating all accepted nodes' candidate sets in
            # one gathered dispatch is exactly the serial outcome.  This
            # cuts init fetches from one per seed to one per wave
            # (74 s -> the wave-scan floor at N=20000, VERDICT r4 next #6).
            if transfers:
                iis = np.concatenate([
                    np.full(len(cand), node, dtype=np.int64)
                    for node, cand in transfers])
                jjs = np.concatenate([cand for _, cand in transfers])
                d_all, _, c_all = nj.set_dist_criterion_batch(n_seqs, iis, jjs)
                off = 0
                for node, cand in transfers:
                    d = d_all[off: off + len(cand)]
                    c = c_all[off: off + len(cand)]
                    off += len(cand)
                    o = np.argsort(c, kind="stable")
                    self._sort_save(nj, node, cand[o], d[o], None, m,
                                    presorted=True)
            if 4 * n_disc > len(wave):
                wave_k = max(4, wave_k // 2)
            elif wave_k < 64:
                wave_k *= 2

        for i in range(n_seqs):
            assert self.hits_j[i] is not None
            self.visible_j[i] = self.hits_j[i][0]
            self.visible_dist[i] = self.hits_dist[i][0]

        self._check_reverse_inclusion(nj, n_seqs)

    def _process_seed(self, nj, seed: int, dist_row, weight_row, n_seqs: int,
                      m: int, q: int, close: float, n_gaps, visited,
                      transfers=None, topk=None) -> None:
        """Per-seed body of setAllLeafTopHits (ref :3860-4014): save the
        seed's list, then close-neighbor inheritance.  Without 2nd-level
        lists the accepted neighbors' transfers are APPENDED to `transfers`
        (when given) for one wave-level gathered dispatch -- their accept
        decisions depend only on the seed's scan and `visited`, never on
        transfer results; with transfers=None they dispatch per seed.
        `topk`: pre-sorted (idx, dist, weight) of the best 2m+2 candidates
        by criterion from the device top-k scan (everything below only
        reads within that prefix)."""
        opts = self.options
        if topk is not None:
            sj, sdist, sweight = topk
            sweight = np.where(sweight > 0, sweight, 0.01)
            nj.debug.profile_ops += n_seqs
        else:
            dist, weight, crit = nj.best_hit_arrays(seed, dist_row,
                                                    weight_row, n_seqs)
            order = np.argsort(crit, kind="stable")
            sj = order
            sdist = dist[order]
            sweight = weight[order]
        self._sort_save(nj, seed, sj, sdist, None, m, presorted=True)

        # close-neighbor inheritance (ref :3933-4014)
        neardist = sdist[2 * m - 1] * close
        nearweight = sweight[: 2 * m].sum() / (2.0 * m)
        nearweight *= 1.0 - 2.0 * neardist / 3.0
        nearcover = 1.0 - neardist / 2.0

        plain_accept = []  # batched 1st-level transfers (no 2nd-level chains)
        for i_close in range(m):
            close_node = int(sj[i_close])
            if close_node >= n_seqs or visited[close_node]:
                continue
            ch_dist = sdist[i_close]
            ch_weight = sweight[i_close]
            is_close = ch_dist <= neardist and (
                ch_weight >= nearweight
                or ch_weight >= (nj.n_pos - n_gaps[close_node]) * nearcover)
            identical = (ch_dist < 1e-6
                         and abs(ch_weight - (nj.n_pos - n_gaps[seed])) < 1e-5
                         and abs(ch_weight - (nj.n_pos - n_gaps[close_node])) < 1e-5)
            if opts.use_tophits_2nd and i_close < q and (is_close or identical):
                nj.debug.n_close2_used += 1
                n_use = min(q * opts.tophits2_safety, 2 * m)
                self._transfer_and_save(nj, close_node, sj[:n_use], n_seqs, q)
                visited[close_node] = True
                self.hit_source[close_node] = seed
            elif is_close or identical or (opts.fastest and i_close < (q + 1) // 2):
                nj.debug.n_close_used += 1
                visited[close_node] = True
                if opts.use_tophits_2nd:
                    sj2, sd2 = self._transfer_and_save(nj, close_node,
                                                       sj[: 2 * m], n_seqs, m)
                    # 2nd level transfer (ref :3993-4012)
                    for i2 in range(min(q, 2 * m)):
                        cn2 = int(sj2[i2])
                        if cn2 >= 0 and cn2 < n_seqs and not visited[cn2]:
                            nj.debug.n_close2_used += 1
                            n_use = min(q * opts.tophits2_safety, 2 * m)
                            self._transfer_and_save(nj, cn2, sj2[:n_use],
                                                    n_seqs, q)
                            visited[cn2] = True
                            self.hit_source[cn2] = close_node
                else:
                    plain_accept.append(close_node)

        if plain_accept:
            # all accepted neighbors evaluate the same candidate set sj[:2m]
            cand = np.asarray(sj[: 2 * m], dtype=np.int64)
            if transfers is not None:
                # defer to the wave-level gathered dispatch (caller)
                for node in plain_accept:
                    transfers.append((node, cand))
                return
            iis = np.repeat(np.asarray(plain_accept, dtype=np.int64), len(cand))
            jjs = np.tile(cand, len(plain_accept))
            d_all, w_all, c_all = nj.set_dist_criterion_batch(n_seqs, iis, jjs)
            for k, node in enumerate(plain_accept):
                d = d_all[k * len(cand): (k + 1) * len(cand)]
                c = c_all[k * len(cand): (k + 1) * len(cand)]
                o = np.argsort(c, kind="stable")
                self._sort_save(nj, node, cand[o], d[o], None, m,
                                presorted=True)

    def _transfer_and_save(self, nj, node: int, cand_js, n_active: int,
                           n_out: int):
        """transferBestHits + sortSaveBestHits for a close neighbor: evaluate
        dist+criterion of node vs candidate set in one batched call."""
        cand = np.asarray(cand_js, dtype=np.int64)
        iis = np.full(len(cand), node, dtype=np.int64)
        dist, weight, crit = nj.set_dist_criterion_batch(n_active, iis, cand)
        order = np.argsort(crit, kind="stable")
        self._sort_save(nj, node, cand[order], dist[order], None, n_out,
                        presorted=True)
        return cand[order], dist[order]

    def _check_reverse_inclusion(self, nj, n_seqs: int) -> None:
        """Checking phase: hits of i should appear in j's list (ref :4052-4123).

        At this point every out-distance is fresh at nActive == nSeqs, so the
        criterion is the pure host expression dist - (outI+outJ)/(nSeqs-2) --
        no device work at all.
        """
        n_check = self.q if self.q > 0 else int(0.5 + 2.0 * math.sqrt(self.m))
        out = nj.out_distances
        denom = n_seqs - 2

        def crit(i, j, dist):
            return dist - (out[i] + out[j]) / denom

        l_replace = 0
        for i_node in range(n_seqs):
            js = self.hits_j[i_node]
            ds = self.hits_dist[i_node]
            for i_hit in range(min(n_check, len(js))):
                j = int(js[i_hit])
                c = crit(i_node, j, ds[i_hit])
                tj = self.hits_j[j]
                td = self.hits_dist[j]
                if crit(j, int(tj[n_check - 1]), td[n_check - 1]) < c:
                    continue
                if i_node in tj:
                    continue
                crits = td - (out[j] + out[tj]) / denom
                i_worst = int(np.argmax(crits))
                if crits[i_worst] > c:
                    tj[i_worst] = i_node
                    td[i_worst] = ds[i_hit]
                    l_replace += 1
                    v = self.get_visible(nj, n_seqs, j)
                    if v is not None and c < v.criterion:
                        self.visible_j[j] = i_node
                        self.visible_dist[j] = td[i_worst]

    # ----------------------------------------------------------- search phase
    def search(self, nj, n_active: int) -> Besthit:
        """ref topHitNJSearch tcc:4137-4264."""
        opts = self.options
        tree = nj.tree
        n_candidate = 0
        best_node = -1
        best_crit = 1e20
        vis = self.get_visible_batch(nj, n_active, self.topvisible)
        for i_node in self.topvisible:
            v = vis.get(int(i_node))
            if v is not None:
                n_candidate += 1
                if best_node < 0 or v.criterion < best_crit:
                    best_node = int(i_node)
                    best_crit = v.criterion
        self.topvisible_age += 1
        if (2 * self.topvisible_age > self.m
                or (3 * n_candidate < len(self.topvisible)
                    and 3 * n_candidate < n_active)):
            if self.topvisible_age <= 2:
                # expand visible set by walking up (ref :4171-4201), all walked
                # nodes' pair distances evaluated in ONE batched dispatch
                walk_i, walk_j = [], []
                for i_node in range(tree.maxnode):
                    if tree.parent[i_node] >= 0:
                        continue
                    vj = int(self.visible_j[i_node])
                    newj = tree.active_ancestor(vj)
                    if newj >= 0 and newj != vj:
                        if newj == i_node:
                            newj = 0
                            while tree.parent[newj] >= 0 or newj == i_node:
                                newj += 1
                        walk_i.append(i_node)
                        walk_j.append(newj)
                if walk_i:
                    d, w, c = nj.set_dist_criterion_batch(
                        n_active, walk_i, walk_j)
                    for k, i_node in enumerate(walk_i):
                        self.visible_j[i_node] = walk_j[k]
                        self.visible_dist[i_node] = d[k]
            self.reset_top_visible(nj, n_active)
            return self.search(nj, n_active)

        assert best_node >= 0 and tree.parent[best_node] < 0
        # the batch scan above already criterion-refreshed this entry; reuse it
        # (identical math to a fresh get_visible call)
        join = vis[best_node]

        if opts.fastest:
            return join

        while True:
            join, changed = self.hill_climb_step(nj, join, n_active)
            if changed:
                nj.debug.n_hill_better += 1
            else:
                break
        return join

    def hill_climb_step(self, nj, join: Besthit, n_active: int):
        """One hill-climb iteration (ref topHitNJSearch tcc:4226-4263):
        getBestFromTopHits of join.i and join.j with both hit lists' changed
        pairs evaluated in ONE dispatch.  The join.j half is speculative (the
        reference evaluates it against the possibly-updated join); if the
        join.i half changes the join, the j-half's out-distance refreshes are
        rolled back and the new j is evaluated separately -- values and
        staleness bookkeeping match the sequential order exactly."""
        opts = self.options
        i, j = join.i, join.j
        pi = self._prep_hits(nj, i)
        pj = self._prep_hits(nj, j)

        # refresh policy, applied sequentially per half (host math whenever
        # the fused join's prefetch cached the raw out-profile scans)
        self._apply_half_refresh(nj, i, pi, n_active)
        snap = self._apply_half_refresh(nj, j, pj, n_active, snapshot=True)

        # the ONE pairs dispatch: both halves' changed ancestor pairs
        n_ci, n_cj = len(pi.changed_idx), len(pj.changed_idx)
        if n_ci + n_cj:
            iis = np.concatenate([np.full(n_ci, i), np.full(n_cj, j)])
            jjs = np.concatenate([pi.anc[pi.changed_idx], pj.anc[pj.changed_idx]])
            d, w, _ = nj.set_dist_criterion_batch(n_active, iis, jjs)
            pi.out_d[pi.changed_idx] = d[:n_ci]
            pj.out_d[pj.changed_idx] = d[n_ci:]

        best = self._best_from_prepped(nj, i, pi, n_active)
        if best.j != join.j and best.criterion < join.criterion:
            # misspeculation: undo the j-half refreshes, evaluate the new j
            for node, od, na in snap:
                nj.out_distances[node] = od
                nj.n_out_dist_active[node] = na
            join = best
            best = self.get_best_from_top_hits(nj, join.j, n_active)
            if best.j != join.i and best.criterion < join.criterion:
                join = best
            return join, True

        best = self._best_from_prepped(nj, j, pj, n_active)
        if best.j != join.i and best.criterion < join.criterion:
            return best, True
        return join, False

    class _Prepped:
        __slots__ = ("anc", "valid_idx", "changed_idx", "out_d")

    def _prep_hits(self, nj, i_node: int):
        """Host half of getBestFromTopHits: remap the hit list to active
        ancestors; changed pairs need re-evaluated distances."""
        tree = nj.tree
        assert i_node >= 0 and tree.parent[i_node] < 0
        js = self.hits_j[i_node]
        p = self._Prepped()
        anc = np.array([tree.active_ancestor(int(j)) for j in js],
                       dtype=np.int64)
        valid = (anc >= 0) & (anc != i_node)
        p.anc = anc
        p.valid_idx = np.nonzero(valid)[0]
        p.changed_idx = np.nonzero(valid & (anc != js))[0]
        p.out_d = self.hits_dist[i_node].copy()
        return p

    def _apply_half_refresh(self, nj, i_node: int, p, n_active: int,
                            snapshot: bool = False):
        """Apply the out-distance refreshes the sequential
        getBestFromTopHits(i_node) dispatch would perform: i_node itself when
        not current (unless -fastest), plus stale-beyond-allowance nodes among
        the pair partners and valid ancestors.  Returns (node, od, na)
        snapshots for rollback when requested."""
        n_diff_allow = int(n_active * nj.options.stale_out_limit) \
            if nj.options.tophits_mult > 0 else 0
        nodes = np.unique(np.concatenate([[i_node], p.anc[p.valid_idx]]))
        stale = nodes[nj.n_out_dist_active[nodes] - n_active > n_diff_allow]
        refresh = set(int(n) for n in stale)
        if (not nj.options.fastest
                and nj.n_out_dist_active[i_node] != n_active):
            refresh.add(i_node)
        refresh = np.array(sorted(refresh), dtype=np.int64)
        snap = []
        if snapshot:
            snap = [(int(n), float(nj.out_distances[n]),
                     int(nj.n_out_dist_active[n])) for n in refresh]
        if len(refresh):
            nj.set_out_distance(refresh, n_active, force=True)
        return snap

    def _best_from_prepped(self, nj, i_node: int, p, n_active: int) -> Besthit:
        """Criterion + argmin over a prepped hit list (out-distances fresh or
        within the staleness allowance, so this is host math)."""
        best = Besthit(i_node)
        if len(p.valid_idx):
            crit = nj.set_criterion_batch(
                n_active, np.full(len(p.valid_idx), i_node),
                p.anc[p.valid_idx], p.out_d[p.valid_idx])
            k = int(np.argmin(crit))
            b = p.valid_idx[k]
            best = Besthit(i_node, int(p.anc[b]), -1.0, float(p.out_d[b]),
                           float(crit[k]))
        assert best.j >= 0
        return best

    def get_best_from_top_hits(self, nj, i_node: int, n_active: int) -> Besthit:
        """ref getBestFromTopHits tcc:4267-4298 -- batched over the hit list.

        Fallback single-node form (the hill-climb uses hill_climb_step, which
        fuses both halves into one dispatch).  The changed-ancestor pair
        distances plus the staleOutLimit refreshes share one dispatch; the
        no-changed-pairs branch may add a second for i_node's own refresh
        when the out-raw cache misses."""
        tree = nj.tree
        assert i_node >= 0 and tree.parent[i_node] < 0
        js = self.hits_j[i_node]
        dists = self.hits_dist[i_node]
        anc = np.array([tree.active_ancestor(int(j)) for j in js])
        valid = (anc >= 0) & (anc != i_node)
        changed = valid & (anc != js)
        vidx = np.nonzero(valid)[0]
        # recompute changed pairs; unchanged keep stored dist.  The fused call
        # also refreshes i_node (setOutDistance semantics, non-forced) and any
        # stale valid ancestors so the criterion below is pure host math.
        out_d = dists.copy()
        idx = np.nonzero(changed)[0]
        refresh_neq = [i_node] if not self.options.fastest else None
        if len(idx):
            d, w, _ = nj.set_dist_criterion_batch(
                n_active, np.full(len(idx), i_node), anc[idx],
                refresh_neq=refresh_neq, stale_extra=anc[vidx])
            out_d[idx] = d
        else:
            # no changed pairs: refresh through a pairs-free dispatch only if
            # anything actually needs it
            if refresh_neq is not None:
                nj.set_out_distance(np.array([i_node]), n_active)
        best = Besthit(i_node)
        if len(vidx):
            crit = nj.set_criterion_batch(n_active, np.full(len(vidx), i_node),
                                          anc[vidx], out_d[vidx])
            k = int(np.argmin(crit))
            b = vidx[k]
            best = Besthit(i_node, int(anc[b]), -1.0, float(out_d[b]),
                           float(crit[k]))
        assert best.j >= 0
        return best

    # ------------------------------------------------------------- join phase
    def _unique_ancestors(self, nj, i_node: int, cand_js) -> np.ndarray:
        """Host half of uniqueBestHits (ref tcc:4786-4833): remap candidates to
        active ancestors, drop self/joined, dedupe."""
        tree = nj.tree
        anc = np.array([tree.active_ancestor(int(j)) for j in cand_js],
                       dtype=np.int64)
        anc = anc[(anc >= 0) & (anc != i_node)]
        return np.unique(anc)

    def prepare_join_merge(self, nj, newnode: int, n_active: int):
        """All host-side decisions of topHitJoin (ref tcc:4306-4434) made
        BEFORE any device work: the merged candidate list, whether the merged
        list is usable (b_use) or a full refresh is needed, and the 2nd-level
        promotion.  The candidate distances are then evaluated inside the
        fused join dispatch."""
        opts = self.options
        tree = nj.tree
        m, q = self.m, self.q
        c0 = int(tree.children[newnode, 0])
        c1 = int(tree.children[newnode, 1])
        combined = np.concatenate([self.hits_j[c0], self.hits_j[c1]])
        cand = self._unique_ancestors(nj, newnode, combined)
        n_unique = len(cand)

        age_new = (self.age[c0] + self.age[c1] + 1) // 2 + 1
        age_limit = max(1, int(0.5 + math.log2(m)))
        b_second = self.hit_source[c0] >= 0 and self.hit_source[c1] >= 0
        b_use = n_unique == n_active - 1 or (
            age_new <= age_limit
            and n_unique >= (int(0.5 + opts.tophits2_refresh * q) if b_second
                             else int(0.5 + m * opts.tophits_refresh)))

        if not b_use and b_second and age_new <= age_limit:
            # promote 2nd-level to 1st-level from the hit source (ref :4369-4418)
            source = tree.active_ancestor(int(self.hit_source[c0]))
            if source == newnode:
                source = tree.active_ancestor(int(self.hit_source[c1]))
            if (source != newnode and source >= 0
                    and self.hit_source[source] < 0
                    and self.hits_j[source] is not None):
                merged = np.concatenate([cand, [source], self.hits_j[source]])
                cand = self._unique_ancestors(nj, newnode, merged)
                n_unique = len(cand)
                b_use = n_unique >= int(0.5 + m * opts.tophits_refresh)
                b_second = False

        return JoinPlan(c0, c1, cand, b_use, b_second, age_new)

    def prefetch_rows(self, nj, plan) -> np.ndarray:
        """Rows whose raw out-profile distances the fused join should scan for
        the host cache: the top-visible working set and its visible partners
        plus the merge candidates' visible partners -- everything the post-join
        bookkeeping and the next search's staleness refreshes will touch."""
        tree = nj.tree
        rows = set()

        def add(n):
            n = int(n)
            if n >= 0 and tree.parent[n] < 0:
                rows.add(n)

        for t in self.topvisible:
            t = int(t)
            if t < 0 or tree.parent[t] >= 0:
                continue
            rows.add(t)
            add(self.visible_j[t])
        if plan.b_use:
            for c in plan.cand:
                add(self.visible_j[int(c)])
        return np.array(sorted(rows), dtype=np.int64)

    def top_hit_join_fused(self, nj, newnode: int, n_active: int, plan,
                           res: dict) -> None:
        """Apply topHitJoin bookkeeping from the fused join's prefetched
        candidate distances (res['cand_*'] ordered like plan.cand)."""
        opts = self.options
        m, q = self.m, self.q
        self.hits_j[plan.c0] = self.hits_j[plan.c1] = None
        self.hits_dist[plan.c0] = self.hits_dist[plan.c1] = None
        self.age[newnode] = plan.age_new

        if plan.b_use:
            unique_j = plan.cand
            unique_d, unique_w, unique_c = nj.criterion_from_raw(
                n_active, newnode, unique_j, res["cand_dist_raw"],
                res["cand_weight"], res["cand_dout"], res["cand_wout"])
            if plan.b_second:
                self.hit_source[newnode] = self.hit_source[plan.c0]
            n_save = min(len(unique_j), q if plan.b_second else m)
            order = np.argsort(unique_c, kind="stable")
            self._sort_save(nj, newnode, unique_j[order], unique_d[order], None,
                            n_save, presorted=True)
            self.visible_j[newnode] = self.hits_j[newnode][0]
            self.visible_dist[newnode] = self.hits_dist[newnode][0]
            self.update_top_visible(nj, n_active, newnode,
                                    int(self.visible_j[newnode]),
                                    float(self.visible_dist[newnode]))
            keep = order[:n_save]
            self.update_visible(nj, n_active, newnode, unique_j[keep],
                                unique_d[keep], unique_c[keep])
        else:
            self._refresh_node(nj, newnode, n_active)

    def top_hit_join(self, nj, newnode: int, n_active: int) -> None:
        """ref topHitJoin tcc:4306-4533."""
        opts = self.options
        tree = nj.tree
        m, q = self.m, self.q
        c0 = int(tree.children[newnode, 0])
        c1 = int(tree.children[newnode, 1])
        combined_j = np.concatenate([self.hits_j[c0], self.hits_j[c1]])
        unique_j, unique_d, unique_c = self._unique_best_hits(
            nj, newnode, combined_j, n_active)
        n_unique = len(unique_j)
        self.hits_j[c0] = self.hits_j[c1] = None
        self.hits_dist[c0] = self.hits_dist[c1] = None

        self.age[newnode] = (self.age[c0] + self.age[c1] + 1) // 2 + 1
        age_limit = max(1, int(0.5 + math.log2(m)))
        b_second = self.hit_source[c0] >= 0 and self.hit_source[c1] >= 0
        b_use = n_unique == n_active - 1 or (
            self.age[newnode] <= age_limit
            and n_unique >= (int(0.5 + opts.tophits2_refresh * q) if b_second
                             else int(0.5 + m * opts.tophits_refresh)))

        if not b_use and b_second and self.age[newnode] <= age_limit:
            # promote 2nd-level to 1st-level from the hit source (ref :4369-4418)
            source = tree.active_ancestor(int(self.hit_source[c0]))
            if source == newnode:
                source = tree.active_ancestor(int(self.hit_source[c1]))
            if (source != newnode and source >= 0
                    and self.hit_source[source] < 0 and self.hits_j[source] is not None):
                merged = np.concatenate([unique_j, [source], self.hits_j[source]])
                unique_j, unique_d, unique_c = self._unique_best_hits(
                    nj, newnode, merged, n_active)
                n_unique = len(unique_j)
                b_use = n_unique >= int(0.5 + m * opts.tophits_refresh)
                b_second = False

        if b_use:
            if b_second:
                self.hit_source[newnode] = self.hit_source[c0]
            n_save = min(n_unique, q if b_second else m)
            order = np.argsort(unique_c, kind="stable")
            self._sort_save(nj, newnode, unique_j[order], unique_d[order], None,
                            n_save, presorted=True)
            self.visible_j[newnode] = self.hits_j[newnode][0]
            self.visible_dist[newnode] = self.hits_dist[newnode][0]
            self.update_top_visible(nj, n_active, newnode,
                                    int(self.visible_j[newnode]),
                                    float(self.visible_dist[newnode]))
            keep = order[:n_save]
            self.update_visible(nj, n_active, newnode, unique_j[keep],
                                unique_d[keep], unique_c[keep])
        else:
            self._refresh_node(nj, newnode, n_active)

    def _refresh_node(self, nj, newnode: int, n_active: int) -> None:
        """Full refresh of a node's top-hit list (ref topHitJoin :4438-4517):
        one-vs-all scan + neighbor list expansion + topvisible reset."""
        opts = self.options
        tree = nj.tree
        m, q = self.m, self.q
        nj.debug.n_refresh_tophits += 1
        self.age[newnode] = 0
        active = np.nonzero(nj.active_mask()[: tree.maxnode])[0]
        if opts.fastest:
            nj.set_criterion_batch(n_active, active, active,
                                   np.zeros(len(active)))
        else:
            nj.set_out_distance(active, n_active)
        _, all_ = nj.set_best_hit(newnode, n_active, want_all=True)
        dist, weight, crit = all_
        order = np.argsort(crit, kind="stable")
        self._sort_save(nj, newnode, order, dist[order], None, m,
                        presorted=True)
        self.visible_j[newnode] = self.hits_j[newnode][0]
        self.visible_dist[newnode] = self.hits_dist[newnode][0]

        # expand the lists of the new node's top m hits (ref :4477-4515); all
        # expansions' distances+criteria are evaluated in ONE gathered dispatch
        # (the per-node refreshes and list merges are independent: each node's
        # candidates depend only on pre-refresh hit lists and newnode's)
        top_js = self.hits_j[newnode][:m]
        work = []           # (j_node, n_new, uniq ancestors)
        all_i, all_j = [], []
        for j_node in top_js:
            j_node = int(j_node)
            if tree.parent[j_node] >= 0 or self.hits_j[j_node] is None:
                continue
            self.age[j_node] = 0
            if n_active <= 2 * m:
                self.hit_source[j_node] = -1
            n_new = q if self.hit_source[j_node] >= 0 else m
            both = np.concatenate([self.hits_j[j_node],
                                   [newnode],
                                   self.hits_j[newnode][: 2 * n_new]])
            uniq = self._unique_ancestors(nj, j_node, both)
            work.append((j_node, n_new, uniq))
            all_i.append(np.full(len(uniq), j_node, dtype=np.int64))
            all_j.append(uniq)
        if work:
            dist, weight, crit = nj.set_dist_criterion_batch(
                n_active, np.concatenate(all_i), np.concatenate(all_j))
            off = 0
            for j_node, n_new, uniq in work:
                ud = dist[off: off + len(uniq)]
                uc = crit[off: off + len(uniq)]
                off += len(uniq)
                order2 = np.argsort(uc, kind="stable")
                self._sort_save(nj, j_node, uniq[order2], ud[order2], None,
                                n_new, presorted=True)
                self.visible_j[j_node] = self.hits_j[j_node][0]
                self.visible_dist[j_node] = self.hits_dist[j_node][0]
        self.reset_top_visible(nj, n_active)

    def _unique_best_hits(self, nj, i_node: int, cand_js, n_active: int):
        """uniqueBestHits (ref tcc:4786-4833): remap to active ancestors, dedupe,
        recompute dist & criterion in one batched call."""
        tree = nj.tree
        anc = np.array([tree.active_ancestor(int(j)) for j in cand_js],
                       dtype=np.int64)
        anc = anc[(anc >= 0) & (anc != i_node)]
        uniq = np.unique(anc)
        if len(uniq) == 0:
            return uniq, np.array([]), np.array([])
        iis = np.full(len(uniq), i_node, dtype=np.int64)
        dist, weight, crit = nj.set_dist_criterion_batch(n_active, iis, uniq)
        return uniq, dist, crit

    # ----------------------------------------------------- visible set upkeep
    def update_visible(self, nj, n_active: int, i_node: int, jjs, dists, crits):
        """ref updateVisible tcc:4635-4658 (criteria evaluated in one batch)."""
        vis = self.get_visible_batch(nj, n_active, jjs)
        for j, d, c in zip(jjs, dists, crits):
            j = int(j)
            v = vis.get(j)
            if v is None or c < v.criterion:
                if v is not None:
                    nj.debug.n_visible_update += 1
                self.visible_j[j] = i_node
                self.visible_dist[j] = d
                self.update_top_visible(nj, n_active, j, i_node, d)

    def update_top_visible(self, nj, n_active: int, i_in: int, hit_j: int,
                           hit_dist: float) -> None:
        """ref updateTopVisible tcc:4661-4726."""
        tree = nj.tree
        b_in = False
        for k, i_node in enumerate(self.topvisible):
            i_node = int(i_node)
            if i_node == i_in:
                b_in = True
                break
            if i_node < 0 or tree.parent[i_node] >= 0:
                self.topvisible[k] = i_in
                b_in = True
                break
        i_pos_worst = -1
        d_crit_worst = -1e20
        if not b_in:
            vis = self.get_visible_batch(nj, n_active, self.topvisible)
            for k, i_node in enumerate(self.topvisible):
                i_node = int(i_node)
                v = vis.get(i_node)
                if v is None:
                    self.topvisible[k] = i_in
                    b_in = True
                    break
                if v.i == hit_j and v.j == i_in:
                    b_in = True
                    break
                if v.criterion >= d_crit_worst:
                    i_pos_worst = k
                    d_crit_worst = v.criterion
        if not b_in and i_pos_worst >= 0:
            crit = float(nj.set_criterion_batch(n_active, [i_in], [hit_j],
                                                [hit_dist])[0])
            if crit < d_crit_worst:
                self.topvisible[i_pos_worst] = i_in

    def reset_top_visible(self, nj, n_active: int) -> None:
        """ref resetTopVisible tcc:4728-4784."""
        tree = nj.tree
        active = [i for i in range(tree.maxnode) if tree.parent[i] < 0]
        vis = self.get_visible_batch(nj, n_active, active)
        entries = [vis[i] for i in active if i in vis]
        assert entries
        entries.sort(key=lambda v: v.criterion)
        in_top = {}
        i_save = 0
        for v in entries:
            if i_save >= len(self.topvisible):
                break
            if in_top.get(v.i) != v.j:
                self.topvisible[i_save] = v.i
                i_save += 1
                in_top[v.i] = v.j
                in_top[v.j] = v.i
        self.topvisible[i_save:] = -1
        self.topvisible_age = 0
