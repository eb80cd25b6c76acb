"""Device-resident NJ join epochs: the WHOLE join loop in one dispatch.

The axon TPU backend charges ~25 ms for every blocking host<->device sync
(see CLAUDE.md), so a host-driven join loop is latency-bound at <40 joins/s
no matter how few dispatches per join it makes.  This module removes the
host from the loop entirely: the complete fastNJ iteration -- top-visible
search (ref topHitNJSearch NeighbourJoining.tcc:4137-4264), hill-climbing
(getBestFromTopHits :4267-4298), the join itself with BIONJ weighting and
the incremental/periodic out-profile policy (fastNJ :2857-3105), the
top-hits merge (topHitJoin :4306-4533, uniqueBestHits :4786-4833), full
list refreshes with neighbor expansion (:4438-4517), and the visible /
top-visible bookkeeping (updateVisible :4635-4658, updateTopVisible
:4661-4726, resetTopVisible :4728-4784) -- runs inside one
`lax.while_loop` over device-resident arrays.  The host enqueues ONE call
for all N-3 joins and fetches the join list at the end.

State layout mirrors the reference's flat per-node arrays; top-hit lists
are a dense [maxnodes, m] int32 matrix padded with -1 (the reference's
variable-length lists).  All heuristic decisions (staleness allowances,
refresh policy, aging, reset conditions, tie-breaking by lowest index /
first slot) reproduce engine/{nj,tophits}.py exactly, which are themselves
oracle-pinned -- tests/test_epoch.py asserts join-for-join identity with
the host path on CPU float64.

Memory design (the round-4 perf fix): the main profile stores (codes/W/U)
are READ-ONLY jit arguments of the epoch, never part of the while-loop
carry.  Each join writes its new profile row into a small [S, ...] side
buffer in the carry; every S joins the host enqueues a separate merge
dispatch that scatters the side rows into the main store (donated), then
re-enters the epoch -- all enqueue-only, still one blocking fetch per
whole join phase.  Rationale: when a `lax.cond` branch reads an array that
the same loop body writes, XLA copy-insertion materialises a defensive
copy of the WHOLE array at the cond (measured ~2.9 ms per occurrence for
the 64 MB store at N=2000 -- the round-3 25 ms/join).  With the main store
read-only, every cond that gathers profile rows (hill-climb, visible
updates, list refreshes, the out-profile reset) is copy-free, and per-join
work returns to the reference's O(m) row-gathers instead of an O(maxnodes)
defensive copy per cond.

Constraint penalties (-constraints) run inside the epoch (branchless
joinConstraintPenalty over [K, n_cons], ref tcc:559-605).  Not yet covered
(falls back to the host loop): -slow, -fastest, 2nd-level top hits (-2nd),
and tophits-off mode.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import kernels
from .profiles import _accum_dtype

INVALID = jnp.int32(2**31 - 1)
BIG = 1e20


class EpochState(NamedTuple):
    # NEW profile rows of the current segment (the main codes/W/U stores are
    # read-only jit arguments of _epoch_run -- see the module docstring; the
    # loop body only ever writes these small [S, ...] staging buffers, which
    # a separate merge dispatch scatters into the main store between
    # segments).  Row `t` holds node id seg_base + t.
    side_c: jax.Array      # [S, P] codes dtype
    side_w: jax.Array      # [S, P] store dtype
    side_u: jax.Array      # [S, P*C] store dtype (2D like the epoch's U_m)
    w_out: jax.Array
    f_out: jax.Array
    # per-node NJ bookkeeping [maxnodes]
    od: jax.Array          # out_distances
    noda: jax.Array        # n_out_dist_active (i32)
    selfdist: jax.Array
    selfweight: jax.Array
    diameter: jax.Array
    vard: jax.Array
    totdiam: jax.Array     # scalar
    parent: jax.Array      # i32, -1 = active
    # constraint counts (ref Profile.nOn/nOff, joinConstraintPenalty
    # tcc:559-605); [M, n_cons] i32, empty (n_cons=0) when unconstrained
    con_on: jax.Array
    con_off: jax.Array
    # top-hits state
    hits_j: jax.Array      # [maxnodes, m] i32, -1 pad
    hits_d: jax.Array      # [maxnodes, m]
    age: jax.Array         # [maxnodes] i32
    vis_j: jax.Array       # [maxnodes] i32
    vis_d: jax.Array       # [maxnodes]
    tv: jax.Array          # [ntv] i32
    tv_age: jax.Array      # scalar i32
    # loop scalars
    n_active: jax.Array    # i32
    maxnode: jax.Array     # i32
    na_reset: jax.Array    # i32 (n_active at last out-profile reset)
    # outputs
    ji: jax.Array          # [n_joins] i32
    jj: jax.Array
    bli: jax.Array         # [n_joins]
    blj: jax.Array
    nj_done: jax.Array     # i32
    # debug counters: [outprofile, profile, seq, avg, hill, visup, refresh]
    ctr: jax.Array         # [8, 2] u32 (lo, hi) -- see _ctr_add


# counter slots
C_OUT, C_PROF, C_SEQ, C_AVG, C_HILL, C_VISUP, C_REFRESH, C_TVRESET = range(8)


def _ctr_add(ctr, slot, v):
    """64-bit-exact counter add on a [8, 2] uint32 (lo, hi) array.

    TPU jit has no int64 without x64 (requesting it truncates with a warning),
    and int32 would wrap at 1M-taxa op counts (profile_ops is O(N*sqrt(N))),
    so the debug tallies carry manually over a uint32 pair."""
    v = jnp.asarray(v).astype(jnp.uint32)
    lo_old = ctr[slot, 0]
    lo = lo_old + v
    hi = ctr[slot, 1] + (lo < lo_old).astype(jnp.uint32)
    return ctr.at[slot, 0].set(lo).at[slot, 1].set(hi)


@functools.partial(
    jax.jit,
    static_argnames=("n_seqs", "use_matrix", "two_tier", "tol", "bionj",
                     "m", "ntv", "stale_limit", "refresh_thresh", "age_limit",
                     "reset_n", "reset_f", "up", "ablate", "n_cons",
                     "con_weight"),
    donate_argnums=(0,))
def _epoch_run(s: EpochState, codes_m, W_m, U_m, seg_base, seg_end,
               code_freq, eigenval, eigentot,
               cout_on, cout_off,
               n_seqs, use_matrix, two_tier, tol, bionj, m, ntv,
               stale_limit, refresh_thresh, age_limit, reset_n, reset_f,
               up=None, ablate=frozenset(), n_cons=0, con_weight=100.0):
    # codes_m/W_m/U_m: the main profile store, READ-ONLY here (module
    # docstring).  U_m arrives PRE-FLATTENED [rows, P*C]: full-store matmuls
    # run natively on it, and only small gathered tiles reshape to [K, P, C]
    # (the 3D store's natural layout would force a 32x-padded transpose copy
    # for every full-store contraction -- 14.7 GB at N=20000).
    # seg_base: first node id staged in the side buffers
    # (= maxnode at segment entry).  seg_end: cumulative nj_done to stop at.
    # `ablate` (perf-debug only, env VFT_EPOCH_ABLATE=a,b,...): skip named
    # phases to attribute device time inside the fused loop.  Results are
    # WRONG under any ablation -- never set outside profiling scripts.
    M = s.parent.shape[0]          # maxnodes
    S = s.side_w.shape[0]
    cd = up if up is not None else s.side_w.dtype
    store_dt = s.side_w.dtype
    ev = eigenval if use_matrix else None
    ev_cd = ev.astype(cd) if ev is not None else None
    et = eigentot if use_matrix else None

    def f(x):
        return x.astype(cd)

    # ---------------------------------------------------------------- helpers
    def clip_ids(x):
        return jnp.clip(x, 0, M - 1).astype(jnp.int32)

    def is_active(s, x):
        xc = clip_ids(x)
        return (x >= 0) & (x < s.maxnode) & (s.parent[xc] < 0)

    def chase(s, x):
        """Active ancestor of each id (-1 stays -1).  ref active_ancestor."""
        def cond(x):
            xc = clip_ids(x)
            return jnp.any((x >= 0) & (s.parent[xc] >= 0))

        def body(x):
            xc = clip_ids(x)
            p = s.parent[xc]
            return jnp.where((x >= 0) & (p >= 0), p, x).astype(x.dtype)

        return jax.lax.while_loop(cond, body, x)

    Pp = W_m.shape[1]              # padded position count
    C = code_freq.shape[1]

    def row_cwu(s, rows):
        """(codes, w, u[K,P,C]) stacks for row ids in STORE dtype, gathering
        from the read-only main store (2D U) or the segment side buffer
        (node ids >= seg_base), with two-tier leaf expansion inside --
        value-identical to the host _rows_cwu (reshape is pure indexing)."""
        rc = clip_ids(rows)
        in_side = rc >= seg_base
        main_r = jnp.where(in_side, 0, rc)
        c_m = codes_m[main_r]
        if two_tier:
            is_leaf = main_r < n_seqs
            phys = jnp.maximum(main_r - n_seqs, 0)
            w_i = W_m[phys]
            u_i = U_m[phys].reshape(-1, Pp, C)
            u_l, w_l = kernels.leaf_u(c_m, code_freq, U_m.dtype)
            w_m = jnp.where(is_leaf[:, None], w_l, w_i)
            u_m = jnp.where(is_leaf[:, None, None], u_l, u_i)
        else:
            w_m = W_m[main_r]
            u_m = U_m[main_r].reshape(-1, Pp, C)
        si = jnp.clip(rc - seg_base, 0, S - 1)
        c = jnp.where(in_side[:, None], s.side_c[si], c_m)
        w = jnp.where(in_side[:, None], s.side_w[si], w_m)
        u = jnp.where(in_side[:, None, None],
                      s.side_u[si].reshape(-1, Pp, C), u_m)
        return c, w, u

    def row_uw(s, rows):
        """(u, w) query stacks for row ids (two-tier leaf expansion inside)."""
        _, w, u = row_cwu(s, rows)
        return f(u), f(w)

    def out_query(s):
        return f(s.w_out[:, None] * s.f_out), f(s.w_out)

    # Expanded row stacks must stay bounded: a [K, P, C] leaf expansion with
    # large K gets a C-minor T(8,128) layout on TPU whose 4->128 lane padding
    # is a 32x memory blowup (a K=80000 refresh at N=20000 is a 20.9 GB
    # allocation -- compile OOM).  Big-K distance paths therefore lax.map
    # over fixed-size chunks, fusing the contraction into each chunk so only
    # [CHUNK, P, C] is ever materialized.  Per-row math is unchanged.
    GCHUNK = 2048

    def _chunked_rows(nodes, body):
        """Pad `nodes` to a CHUNK multiple, map `body` over [CHUNK] slices,
        return the flat [K] results (tuple-valued body supported)."""
        K = nodes.shape[0]
        nc = ((K + GCHUNK - 1) // GCHUNK) * GCHUNK
        padded = jnp.concatenate(
            [nodes, jnp.zeros((nc - K,), dtype=nodes.dtype)])
        out = jax.lax.map(body, padded.reshape(-1, GCHUNK))
        return tuple(o.reshape(-1)[:K] for o in out)

    def dist_vs_out(s, nodes):
        """Raw (dist, weight) of `nodes` vs the current out-profile."""
        uq, wq = out_query(s)

        def one_chunk(rows):
            u, w = row_uw(s, rows)
            return kernels.me_dist_many(u, w, uq, wq, ev_cd)

        if nodes.shape[0] <= GCHUNK:
            return one_chunk(nodes)
        return _chunked_rows(nodes, one_chunk)

    def refresh_vals(s, nodes, na):
        """Fresh out-distance values of `nodes` vs the current out-profile
        (setOutDistance, ref tcc:1012-1083): row gathers + one contraction,
        mirroring the host prof.dist_set_vs_out; no state writes."""
        nc = clip_ids(nodes)
        d, wt = dist_vs_out(s, nc)
        na_f = na.astype(cd)
        return kernels.out_distance_from_hit(
            d, wt, s.selfdist[nc], s.selfweight[nc],
            s.diameter[nc], s.totdiam, na_f)

    def force_refresh(s, nodes, mask, na):
        """Refresh out-distances of nodes[mask] at na.  Masked-off lanes
        scatter to an out-of-bounds index (mode='drop') -- clipping them to a
        real id instead would race fresh values against stale ones when ids
        repeat across lanes (duplicate-scatter order is unspecified)."""
        nc = clip_ids(nodes)
        vals = refresh_vals(s, nc, na)
        tgt = jnp.where(mask, nc, M)
        od = s.od.at[tgt].set(vals, mode="drop")
        noda = s.noda.at[tgt].set(na, mode="drop")
        ctr = _ctr_add(s.ctr, C_OUT, jnp.sum(mask))
        return s._replace(od=od, noda=noda, ctr=ctr)

    def scaled_out(s, x, na):
        """Out-distance scaled for allowed staleness (ref setCriterion
        tcc:1085-1113)."""
        xc = clip_ids(x)
        od = s.od[xc]
        nd = s.noda[xc]
        na_f = na.astype(cd)
        return jnp.where(nd != na, od * (na_f - 1) / (nd.astype(cd) - 1), od)

    def allow(na):
        return jnp.floor(na.astype(cd) * stale_limit).astype(jnp.int32)

    def pair_penalty(s, iis, jjs):
        """Batched joinConstraintPenalty (ref tcc:559-605): weighted count
        of constrained leaves that must move, summed over constraints.
        Branchless over [K, n_cons]; the out-component counts are the
        (join-invariant) leaf totals minus both members'."""
        ic, jc = clip_ids(iis), clip_ids(jjs)
        on1, off1 = s.con_on[ic], s.con_off[ic]
        on2, off2 = s.con_on[jc], s.con_off[jc]
        on3 = cout_on[None, :] - on1 - on2
        off3 = cout_off[None, :] - off1 - off2

        def code(on, off):
            return jnp.where((on > 0) & (off > 0), -1,
                             jnp.where(on > 0, 1, 0)).astype(jnp.int32)

        c1, c2, c3 = code(on1, off1), code(on2, off2), code(on3, off3)
        nonzero = (on1 + off1 > 0) & (on2 + off2 > 0) & (on3 + off3 > 0)
        n_split = ((c1 == -1).astype(jnp.int32) + (c2 == -1) + (c3 == -1))
        n_on = ((c1 == 1).astype(jnp.int32) + (c2 == 1) + (c3 == 1))
        active = nonzero & (n_split == 1) & (n_on == 1)
        on_a, off_a = on1 + on2, off1 + off2
        pen = jnp.where(on_a + off3 < on3 + off_a,
                        jnp.minimum(on_a, off3), jnp.minimum(on3, off_a))
        return jnp.sum(jnp.where(active, pen, 0), axis=1).astype(cd)

    def add_penalty(s, dist, iis, jjs):
        if not n_cons:
            return dist
        return dist + con_weight * pair_penalty(s, iis, jjs)

    def crit_refresh(s, iis, jjs, dists, na, valid):
        """set_criterion_batch: force-refresh beyond-allowance nodes among the
        pair members, then the scaled criterion."""
        nodes = jnp.concatenate([iis, jjs]).astype(jnp.int32)
        vmask = jnp.concatenate([valid, valid])
        stale = vmask & (s.noda[clip_ids(nodes)] - na > allow(na))
        s = force_refresh(s, nodes, stale, na)
        crit = dists - (scaled_out(s, iis, na) + scaled_out(s, jjs, na)) \
            / (na.astype(cd) - 2)
        return s, crit

    def pair_dists(s, iis, jjs):
        def one_chunk(pair):
            u1, w1 = row_uw(s, pair[0])
            u2, w2 = row_uw(s, pair[1])
            return kernels.me_dist_rows(u1, w1, u2, w2, ev_cd)

        if iis.shape[0] <= GCHUNK:
            return one_chunk((iis, jjs))
        K = iis.shape[0]
        nc = ((K + GCHUNK - 1) // GCHUNK) * GCHUNK
        pad = lambda x: jnp.concatenate(
            [x, jnp.zeros((nc - K,), dtype=x.dtype)]).reshape(-1, GCHUNK)
        d, wt = jax.lax.map(one_chunk, (pad(iis), pad(jjs)))
        return d.reshape(-1)[:K], wt.reshape(-1)[:K]

    def count_pair_ops(s, iis, jjs, valid):
        leafpair = (iis < n_seqs) & (jjs < n_seqs) & valid
        ctr = _ctr_add(s.ctr, C_SEQ, jnp.sum(leafpair))
        ctr = _ctr_add(ctr, C_PROF, jnp.sum(valid & ~((iis < n_seqs) & (jjs < n_seqs))))
        return s._replace(ctr=ctr)

    def dist_crit(s, iis, jjs, na, valid, extra=None, extra_valid=None,
                  refresh_neq=None):
        """set_dist_criterion_batch (ref tcc:1115-1124 + nj.py): pair distance
        minus diameters, with the fused staleness refreshes, then criterion."""
        d, wt = pair_dists(s, iis, jjs)
        ic, jc = clip_ids(iis), clip_ids(jjs)
        dist = d - (s.diameter[ic] + s.diameter[jc])
        dist = add_penalty(s, dist, iis, jjs)
        wt = jnp.where(wt > 0, wt, 0.01)
        nodes = [iis.astype(jnp.int32), jjs.astype(jnp.int32)]
        masks = [valid, valid]
        if extra is not None:
            nodes.append(extra.astype(jnp.int32))
            masks.append(extra_valid)
        nn = jnp.concatenate(nodes)
        mm = jnp.concatenate(masks)
        stale = mm & (s.noda[clip_ids(nn)] - na > allow(na))
        if refresh_neq is not None:
            rn = jnp.asarray([refresh_neq], dtype=jnp.int32)
            nn = jnp.concatenate([nn, rn])
            stale = jnp.concatenate(
                [stale, (s.noda[clip_ids(rn)] != na)])
        s = force_refresh(s, nn, stale, na)
        s = count_pair_ops(s, iis, jjs, valid)
        crit = dist - (scaled_out(s, iis, na) + scaled_out(s, jjs, na)) \
            / (na.astype(cd) - 2)
        return s, dist, wt, crit

    def visible_crit_batch(s, nodes, na):
        """get_visible_batch (tophits.py): validity + criterion of each node's
        visible entry; refreshes beyond-allowance members first."""
        nc = clip_ids(nodes)
        vj = s.vis_j[nc]
        valid = is_active(s, nodes) & (vj >= 0) & is_active(s, vj)
        dists = s.vis_d[nc]
        s, crit = crit_refresh(s, nc, clip_ids(vj), dists, na, valid)
        crit = jnp.where(valid, crit, BIG)
        return s, crit, valid, vj

    # ------------------------------------------------------ top-hits helpers
    def best_from_tophits(s, i_node, na):
        """getBestFromTopHits (ref tcc:4267-4298) over hits_j[i_node]:
        sequential refresh semantics of tophits._apply_half_refresh +
        _best_from_prepped.  Returns (s, j, dist, crit)."""
        ic = clip_ids(i_node)
        js = s.hits_j[ic]                      # [m]
        anc = chase(s, js)
        valid = (js >= 0) & (anc >= 0) & (anc != i_node)
        changed = valid & (anc != js)
        # refreshes: i_node when not current (non-fastest) + stale-beyond-
        # allowance among {i_node} + valid ancestors (forced)
        nodes = jnp.concatenate([jnp.asarray([i_node], dtype=jnp.int32),
                                 anc.astype(jnp.int32)])
        nmask = jnp.concatenate([jnp.asarray([True]), valid])
        stale = nmask & (s.noda[clip_ids(nodes)] - na > allow(na))
        stale = stale.at[0].set(stale[0] | (s.noda[ic] != na))
        s = force_refresh(s, nodes, stale, na)
        # changed pairs: recompute raw distance minus diameters
        d, wt = pair_dists(s, jnp.full((js.shape[0],), i_node, jnp.int32),
                           clip_ids(anc))
        dist = d - (s.diameter[ic] + s.diameter[clip_ids(anc)])
        dist = add_penalty(s, dist,
                           jnp.full((js.shape[0],), i_node, jnp.int32), anc)
        out_d = jnp.where(changed, dist, s.hits_d[ic])
        s = count_pair_ops(s, jnp.full(js.shape, i_node), anc, changed)
        crit = out_d - (scaled_out(s, jnp.full(js.shape, i_node), na)
                        + scaled_out(s, anc, na)) / (na.astype(cd) - 2)
        crit = jnp.where(valid, crit, BIG)
        k = jnp.argmin(crit)
        return s, anc[k].astype(jnp.int32), out_d[k], crit[k]

    def update_top_visible(s, i_in, hit_j, hit_dist, na):
        """updateTopVisible (ref tcc:4661-4726)."""
        if "utv" in ablate:
            return s
        tv = s.tv
        eq = tv == i_in
        tvc = clip_ids(tv)
        inv = (tv < 0) | (s.parent[tvc] >= 0)
        first_eq = jnp.where(jnp.any(eq), jnp.argmax(eq), ntv)
        first_inv = jnp.where(jnp.any(inv), jnp.argmax(inv), ntv)

        def pass1_replace(s):
            return s._replace(tv=s.tv.at[first_inv].set(i_in))

        def pass2(s):
            s, crit, valid, vj = visible_crit_batch(s, s.tv, na)
            none_m = ~valid
            match_m = valid & (s.tv == hit_j) & (vj == i_in)
            first_none = jnp.where(jnp.any(none_m), jnp.argmax(none_m), ntv)
            first_match = jnp.where(jnp.any(match_m), jnp.argmax(match_m), ntv)

            def none_first(s):
                return s._replace(tv=s.tv.at[first_none].set(i_in))

            def no_break(s):
                # worst slot: LAST index achieving the max criterion (host
                # tracks with >=); all entries valid here
                rev_worst = jnp.argmax(crit[::-1])
                i_worst = ntv - 1 - rev_worst
                d_worst = crit[i_worst]
                ii = jnp.asarray([i_in], dtype=jnp.int32)
                jj = jnp.asarray([hit_j], dtype=jnp.int32)
                s, c_in = crit_refresh(s, ii, jj,
                                       jnp.asarray([hit_dist], dtype=cd), na,
                                       jnp.asarray([True]))
                return jax.lax.cond(
                    c_in[0] < d_worst,
                    lambda s: s._replace(tv=s.tv.at[i_worst].set(i_in)),
                    lambda s: s, s)

            return jax.lax.cond(
                first_none < jnp.minimum(first_match, ntv), none_first,
                lambda s: jax.lax.cond(first_match < ntv, lambda s: s,
                                       no_break, s), s)

        return jax.lax.cond(
            first_eq < first_inv,
            lambda s: s,                       # already in: nothing
            lambda s: jax.lax.cond(first_inv < ntv, pass1_replace, pass2, s),
            s)

    def update_visible(s, newnode, kept_j, kept_d, kept_c, na):
        """updateVisible (ref tcc:4635-4658): batch-evaluate the kept
        candidates' current visible criteria (host get_visible_batch), then
        sequentially apply updates + updateTopVisible."""
        if "uv" in ablate:
            return s
        import os as __os
        if __os.environ.get("VFT_EPOCH_DEBUG"):
            nc_ = clip_ids(kept_j)
            vj_ = s.vis_j[nc_]
            val_ = is_active(s, kept_j) & (vj_ >= 0) & is_active(s, vj_)
            jax.debug.print(
                "UV na={na} kept={a} vj={b} valid={c} noda_vj={d}",
                na=na, a=kept_j, b=vj_, c=val_, d=s.noda[clip_ids(vj_)])
        s, vcrit, vvalid, _ = visible_crit_batch(s, kept_j, na)
        if __os.environ.get("VFT_EPOCH_DEBUG"):
            jax.debug.print(
                "UV post-batch noda_vj={d} vvalid={v}",
                d=s.noda[clip_ids(s.vis_j[clip_ids(kept_j)])], v=vvalid)

        # The update mask is precomputable from the batch evaluation (the
        # host does the same batch-then-apply of the criteria), but each
        # visible-entry WRITE must interleave with its update_top_visible
        # (host tophits.py update_visible): a later candidate sitting in
        # topvisible must still show its OLD visible entry when an earlier
        # candidate's top-visible upkeep batch-evaluates s.tv.  Iterating a
        # while_loop over the SET bits (typically O(1) per join) instead of
        # scanning all m slots keeps the O(set-bits) serial cost.
        mK = kept_j.shape[0]
        do = (kept_j >= 0) & (~vvalid | (kept_c < vcrit))
        ctr = _ctr_add(s.ctr, C_VISUP, jnp.sum(do & vvalid))
        s = s._replace(ctr=ctr)
        order = jnp.sort(jnp.where(do, jnp.arange(mK), mK))

        def uv_body(carry):
            s, t = carry
            k = jnp.minimum(order[t], mK - 1)
            jt = clip_ids(kept_j[k])
            s = s._replace(vis_j=s.vis_j.at[jt].set(newnode),
                           vis_d=s.vis_d.at[jt].set(kept_d[k]))
            s = update_top_visible(s, kept_j[k], newnode, kept_d[k], na)
            return s, t + 1

        def uv_cond(carry):
            s, t = carry
            return (t < mK) & (order[jnp.minimum(t, mK - 1)] < mK)

        s, _ = jax.lax.while_loop(uv_cond, uv_body, (s, jnp.int32(0)))
        return s

    def reset_top_visible(s, na):
        """resetTopVisible (ref tcc:4728-4784): best ntv visible entries with
        reciprocal-pair dedup, in criterion order (stable by node id)."""
        if "rtv" in ablate:
            return s._replace(tv_age=jnp.int32(0))
        all_nodes = jnp.arange(M, dtype=jnp.int32)
        s, crit, valid, vj = visible_crit_batch(s, all_nodes, na)
        key = jnp.where(valid, crit, BIG)
        order = jnp.argsort(key, stable=True).astype(jnp.int32)
        budget = min(M, 2 * ntv + 2)

        def step(carry, k):
            tv_new, in_top, i_save = carry
            e = order[k]
            j = vj[e]
            ok = (key[e] < BIG) & (i_save < ntv) & (in_top[e] != j)

            def save(args):
                tv_new, in_top, i_save = args
                tv_new = tv_new.at[i_save].set(e)
                in_top = in_top.at[e].set(j).at[clip_ids(j)].set(e)
                return tv_new, in_top, i_save + 1

            carry = jax.lax.cond(ok, save, lambda a: a,
                                 (tv_new, in_top, i_save))
            return carry, None

        tv0 = jnp.full((ntv,), -1, dtype=jnp.int32)
        in_top0 = jnp.full((M,), INVALID, dtype=jnp.int32)
        (tv_new, _, _), _ = jax.lax.scan(
            step, (tv0, in_top0, jnp.int32(0)), jnp.arange(budget))
        ctr = _ctr_add(s.ctr, C_TVRESET, 1)
        return s._replace(tv=tv_new, tv_age=jnp.int32(0), ctr=ctr)

    def expand_visible(s, na):
        """Visible-set expansion at topvisible reset (ref tcc:4171-4201):
        remap every active node's visible partner to its active ancestor."""
        if "ev" in ablate:
            return s
        nodes = jnp.arange(M, dtype=jnp.int32)
        act = is_active(s, nodes)
        vj = s.vis_j
        newj = chase(s, vj)
        # self-collision: first active node that is not i (ref: newj=0; while
        # parent>=0 or ==i: newj++)
        act_i32 = act
        first = jnp.argmax(act_i32)
        # second active node (first one excluded)
        act2 = act_i32.at[first].set(False)
        second = jnp.argmax(act2)
        newj = jnp.where(newj == nodes,
                         jnp.where(first == nodes, second, first),
                         newj).astype(jnp.int32)
        walk = act & (vj >= 0) & (newj >= 0) & (newj != vj)
        s, dist, wt, crit = dist_crit(s, nodes, newj, na, walk)
        vis_j = jnp.where(walk, newj, s.vis_j)
        vis_d = jnp.where(walk, dist, s.vis_d)
        return s._replace(vis_j=vis_j, vis_d=vis_d)

    # ---------------------------------------------------------------- search
    def search(s, na):
        """topHitNJSearch (ref tcc:4137-4264)."""
        def scan_tv(s):
            s, crit, valid, vj = visible_crit_batch(s, s.tv, na)
            n_cand = jnp.sum(valid).astype(jnp.int32)
            k = jnp.argmin(crit)            # first min: ties -> lowest slot
            tvc = clip_ids(s.tv)
            return s, (s.tv[k], vj[k], s.vis_d[tvc[k]], crit[k], n_cand)

        def loop_body(carry):
            s, _, it = carry
            s, (bi, bj, bd, bc, n_cand) = scan_tv(s)
            s = s._replace(tv_age=s.tv_age + 1)
            reset = (2 * s.tv_age > m) | ((3 * n_cand < ntv)
                                          & (3 * n_cand < na))

            def do_reset(s):
                s = jax.lax.cond(s.tv_age <= 2,
                                 lambda s: expand_visible(s, na),
                                 lambda s: s, s)
                return reset_top_visible(s, na)

            s = jax.lax.cond(reset, do_reset, lambda s: s, s)
            return s, (bi, bj, bd, bc, reset), it + 1

        def loop_cond(carry):
            _, (_, _, _, _, reset), it = carry
            return reset & (it < 4)

        zero = jnp.asarray(0.0, dtype=cd)
        init = (s, (jnp.int32(-1), jnp.int32(-1), zero, zero,
                    jnp.bool_(True)), jnp.int32(0))
        s, (bi, bj, bd, bc, _), _ = jax.lax.while_loop(
            loop_cond, loop_body, init)
        # on exit the last body pass did not reset: (bi,bj) is the final pick
        if "hill" in ablate:
            return s, bi, bj, bd, bc

        # hill-climb (ref tcc:4226-4263 via tophits.hill_climb_step)
        def hill_body(carry):
            s, ji, jj, jd, jc, changed, it = carry
            s, b_j, b_d, b_c = best_from_tophits(s, ji, na)
            better_i = (b_j != jj) & (b_c < jc)

            def mis(args):
                s, ji, jj, jd, jc = args
                ji2, jj2, jd2, jc2 = ji, b_j, b_d, b_c
                s, b2_j, b2_d, b2_c = best_from_tophits(s, jj2, na)
                take = (b2_j != ji2) & (b2_c < jc2)
                return (s,
                        jnp.where(take, jj2, ji2),
                        jnp.where(take, b2_j, jj2),
                        jnp.where(take, b2_d, jd2),
                        jnp.where(take, b2_c, jc2),
                        jnp.bool_(True))

            def nomis(args):
                s, ji, jj, jd, jc = args
                s, b2_j, b2_d, b2_c = best_from_tophits(s, jj, na)
                take = (b2_j != ji) & (b2_c < jc)
                return (s,
                        jnp.where(take, jj, ji),
                        jnp.where(take, b2_j, jj),
                        jnp.where(take, b2_d, jd),
                        jnp.where(take, b2_c, jc),
                        take)

            s, ji, jj, jd, jc, changed = jax.lax.cond(
                better_i, mis, nomis, (s, ji, jj, jd, jc))
            ctr = _ctr_add(s.ctr, C_HILL, changed)
            return s._replace(ctr=ctr), ji, jj, jd, jc, changed, it + 1

        def hill_cond(carry):
            _, _, _, _, _, changed, it = carry
            return changed & (it < 100)

        s, ji, jj, jd, jc, _, _ = jax.lax.while_loop(
            hill_cond, hill_body,
            (s, bi, bj, bd, bc, jnp.bool_(True), jnp.int32(0)))
        return s, ji, jj, jd, jc

    # ------------------------------------------------------------------ join
    def do_join(s, i, j, na):
        """The join body (ref fastNJ tcc:2857-3105 / engine/fused.py math)."""
        newnode = s.maxnode
        ic, jc = clip_ids(i), clip_ids(j)
        pair = jnp.stack([i, j]).astype(jnp.int32)
        cg, wg, ug = row_cwu(s, pair)          # store dtype, reused below
        # non-forced refresh of i, j at na (host set_out_distance([i,j], na))
        if "j_refresh" not in ablate:
            mask = s.noda[pair] != na
            s = force_refresh(s, pair, mask, na)
        d_p, w_p = kernels.me_dist_rows(f(ug[:1]), f(wg[:1]),
                                        f(ug[1:]), f(wg[1:]), ev_cd)
        weight_ij = jnp.where(w_p[0] > 0, w_p[0], 0.01)
        dist_ij = d_p[0] - (s.diameter[ic] + s.diameter[jc])
        dist_ij = add_penalty(s, dist_ij[None], pair[:1], pair[1:])[0]
        s = count_pair_ops(s, pair[:1], pair[1:], jnp.asarray([True]))
        na_f = na.astype(cd)
        delta = (s.od[ic] - s.od[jc]) / (na_f - 2)
        bl_i = (dist_ij + delta) / 2.0
        bl_j = (dist_ij - delta) / 2.0

        raw_ij = dist_ij + s.diameter[ic] + s.diameter[jc]
        var_ij = raw_ij - s.vard[ic] - s.vard[jc]
        if bionj and "j_bionj" not in ablate:
            # raw (dist, weight) of i and j vs the CURRENT (pre-update)
            # out-profile, as the host reads from its out-raw cache
            uq_o, wq_o = out_query(s)
            douts, wouts = kernels.me_dist_many(f(ug), f(wg), uq_o, wq_o,
                                                ev_cd)
            var_i_weight = na_f * wouts[0] - s.selfweight[ic] - weight_ij
            var_j_weight = na_f * wouts[1] - s.selfweight[jc] - weight_ij
            var_i_top = (douts[0] * wouts[0] * na_f
                         - s.selfdist[ic] * s.selfweight[ic]
                         - raw_ij * weight_ij)
            var_j_top = (douts[1] * wouts[1] * na_f
                         - s.selfdist[jc] * s.selfweight[jc]
                         - raw_ij * weight_ij)
            ok = (var_j_weight > 0.01) & (var_i_weight > 0.01)
            d_pv_out = (na_f - 2) * (
                var_j_top / jnp.where(ok, var_j_weight, 1.0)
                - var_i_top / jnp.where(ok, var_i_weight, 1.0))
            d_var_diam = (na_f - 2) * (s.vard[ic] - s.vard[jc])
            outer = (weight_ij > 0.01) & (var_ij > 0.001)
            inner = 0.5 + (d_pv_out + d_var_diam) / (
                2.0 * (na_f - 2) * jnp.where(outer, var_ij, 1.0))
            inner = jnp.where(ok, inner, 0.5)
            inner = jnp.clip(inner, 0.0, 1.0)
            bw = jnp.where(outer, inner, jnp.asarray(0.5, dtype=cd))
            ctr = _ctr_add(s.ctr, C_OUT, jnp.where(outer & ok, 2, 0))
            s = s._replace(ctr=ctr)
        else:
            bw = jnp.asarray(0.5, dtype=cd)

        diam_new = bw * (bl_i + s.diameter[ic]) + (1.0 - bw) * (bl_j + s.diameter[jc])
        vard_new = (bw * s.vard[ic] + (1.0 - bw) * s.vard[jc]
                    + bw * (1.0 - bw) * var_ij)

        # profile average into the new row (store dtype, like _join_update),
        # staged in the segment side buffer at index newnode - seg_base
        c_new, w_new, u_new, _ = kernels.average_profile(
            cg[0], wg[0], ug[0], cg[1], wg[1], ug[1], bw.astype(store_dt),
            code_freq, et, tol)
        if "j_avg" not in ablate:
            sidx = jnp.clip(newnode - seg_base, 0, S - 1)
            s = s._replace(side_c=s.side_c.at[sidx].set(c_new),
                           side_w=s.side_w.at[sidx].set(w_new),
                           side_u=s.side_u.at[sidx].set(u_new.reshape(-1)))

        if "j_self" in ablate:
            d_self = w_self = jnp.zeros((1,), dtype=cd)
        else:
            d_self, w_self = kernels.me_dist_rows(
                f(u_new[None]), f(w_new[None]), f(u_new[None]), f(w_new[None]),
                ev_cd)

        # tree bookkeeping before the out-profile policy (host order)
        parent = s.parent.at[ic].set(newnode).at[jc].set(newnode)
        diameter = s.diameter.at[newnode].set(diam_new)
        vard = s.vard.at[newnode].set(vard_new)
        selfdist = s.selfdist.at[newnode].set(d_self[0])
        selfweight = s.selfweight.at[newnode].set(w_self[0])
        noda = s.noda.at[ic].set(na).at[jc].set(na)
        if n_cons:
            s = s._replace(
                con_on=s.con_on.at[newnode].set(s.con_on[ic] + s.con_on[jc]),
                con_off=s.con_off.at[newnode].set(
                    s.con_off[ic] + s.con_off[jc]))
        k = s.nj_done
        s = s._replace(parent=parent, diameter=diameter, vard=vard,
                       selfdist=selfdist, selfweight=selfweight, noda=noda,
                       maxnode=s.maxnode + 1,
                       ji=s.ji.at[k].set(i), jj=s.jj.at[k].set(j),
                       bli=s.bli.at[k].set(bl_i), blj=s.blj.at[k].set(bl_j),
                       nj_done=k + 1,
                       ctr=_ctr_add(s.ctr, C_AVG, 1))

        # out-profile policy (ref tcc:3012-3037)
        changed = s.na_reset - (na - 1)
        do_reset = (changed >= reset_n) & (changed.astype(cd)
                                           >= reset_f * s.na_reset.astype(cd))

        def reset_branch(s):
            act = (s.parent < 0) & (jnp.arange(M) < s.maxnode)
            totdiam = jnp.sum(jnp.where(act, s.diameter, 0.0))
            w_out, f_out = _outprofile_dev(s, act)
            return s._replace(w_out=w_out, f_out=f_out, totdiam=totdiam,
                              na_reset=na - 1)

        def update_branch(s):
            w_out, f_out = kernels.update_out_profile(
                s.w_out, s.f_out, ug[0].astype(store_dt),
                wg[0].astype(store_dt), ug[1].astype(store_dt),
                wg[1].astype(store_dt), u_new, w_new,
                na.astype(store_dt), code_freq, et, tol)
            totdiam = s.totdiam + diam_new - s.diameter[ic] - s.diameter[jc]
            return s._replace(w_out=w_out, f_out=f_out, totdiam=totdiam)

        if "j_out" not in ablate:
            s = jax.lax.cond(do_reset, reset_branch, update_branch, s)

        # new node's out-distance vs the updated out-profile at na-1
        if "j_nref" not in ablate:
            nn = jnp.asarray([newnode], dtype=jnp.int32)
            s = force_refresh(s, nn, jnp.asarray([True]), na - 1)
        return s, newnode

    def side_mask(s):
        """Active-row mask over the side buffer (node ids seg_base + t)."""
        ids = seg_base + jnp.arange(S, dtype=jnp.int32)
        return (ids < s.maxnode) & (s.parent[clip_ids(ids)] < 0), ids

    def _outprofile_dev(s, act):
        """outProfile over active rows (ref tcc:729-815), two-tier aware.

        The main store is accumulated with rows >= seg_base masked out and
        the side buffer added right after -- element-wise this equals the
        host's single contiguous-store pass (side rows ARE the tail of the
        row range), without materialising a merged full-store copy (whose
        C-minor tiled layout is a 32x-padded allocation on TPU)."""
        dt = store_dt
        n = jnp.sum(act)
        in_main = jnp.arange(M) < seg_base
        sm, _ = side_mask(s)
        ms = sm.astype(dt)
        if not two_tier:
            fm = jnp.zeros((U_m.shape[0],), dtype=dt)
            fm = fm.at[: M].set((act & in_main).astype(dt))
            w_sum = jnp.einsum("m,mp->p", fm, W_m) \
                + jnp.einsum("s,sp->p", ms, s.side_w)
            w_out = jnp.maximum(w_sum / jnp.maximum(n, 1), 1e-20)
            accum = (jnp.einsum("m,mx->x", fm, U_m)
                     + jnp.einsum("s,sx->x", ms, s.side_u)).reshape(Pp, C)
        else:
            mask_leaf = act[:n_seqs]
            n_int = U_m.shape[0]
            mask_int = jnp.zeros((n_int,), dtype=bool)
            mask_int = mask_int.at[: M - n_seqs].set(
                act[n_seqs:] & in_main[n_seqs:])
            mi = mask_int.astype(dt)
            accum = (jnp.einsum("m,mx->x", mi, U_m)
                     + jnp.einsum("s,sx->x", ms, s.side_u)).reshape(Pp, C)
            w_sum = jnp.einsum("m,mp->p", mi, W_m) \
                + jnp.einsum("s,sp->p", ms, s.side_w)
            # leaf contributions accumulate from codes in CHUNK blocks --
            # the SAME loop as the host profiles._outprofile_full, for both
            # bit-identical order and bounded leaf-expansion memory (leaves
            # are never staged in the side buffer, so main codes suffice)
            CHUNK = 1024
            n_chunks = (n_seqs + CHUNK - 1) // CHUNK
            pad = n_chunks * CHUNK
            from ..constants import NOCODE as _NOCODE
            codes_l = jnp.pad(codes_m[:n_seqs], ((0, pad - n_seqs), (0, 0)),
                              constant_values=_NOCODE)
            mask_l = jnp.pad(mask_leaf, (0, pad - n_seqs))

            def lbody(k, carry):
                accum, w_sum = carry
                blk = jax.lax.dynamic_slice_in_dim(codes_l, k * CHUNK, CHUNK, 0)
                mb = jax.lax.dynamic_slice_in_dim(mask_l, k * CHUNK, CHUNK, 0)
                u_l, w_l = kernels.leaf_u(blk, code_freq, dt)
                mf = mb.astype(dt)
                accum = accum + jnp.einsum("m,mpc->pc", mf, u_l)
                w_sum = w_sum + jnp.einsum("m,mp->p", mf, w_l)
                return accum, w_sum

            accum, w_sum = jax.lax.fori_loop(0, n_chunks, lbody,
                                             (accum, w_sum))
            w_out = jnp.maximum(w_sum / jnp.maximum(n, 1), 1e-20)
        nC = code_freq.shape[0]
        fallback = code_freq[0] if use_matrix else jnp.full(
            (code_freq.shape[1],), 1.0 / nC, dtype=dt)
        f_out = kernels.normalize_freq(accum, et, fallback, tol)
        return w_out, f_out

    # --------------------------------------------------------- top-hits join
    def unique_anc(s, cand, exclude):
        """uniqueBestHits host half: active-ancestor remap + ascending dedupe.
        Returns (ids [L] i32 with -1 pad, n_unique)."""
        anc = chase(s, cand)
        valid = (cand >= 0) & (anc >= 0) & (anc != exclude)
        key = jnp.where(valid, anc, INVALID)
        sk = jnp.sort(key)
        prev = jnp.concatenate([jnp.asarray([-1], dtype=sk.dtype), sk[:-1]])
        um = (sk != prev) & (sk != INVALID)
        uniq = jnp.sort(jnp.where(um, sk, INVALID))
        n_unique = jnp.sum(um).astype(jnp.int32)
        return jnp.where(uniq == INVALID, -1, uniq).astype(jnp.int32), n_unique

    def top_hit_join(s, newnode, c0, c1, na):
        """topHitJoin (ref tcc:4306-4533), 1st-level lists only."""
        combined = jnp.concatenate([s.hits_j[clip_ids(c0)],
                                    s.hits_j[clip_ids(c1)]])
        uniq, n_unique = unique_anc(s, combined, newnode)
        uvalid = uniq >= 0
        s, ud, uw, uc = dist_crit(
            s, jnp.full(uniq.shape, newnode, jnp.int32), uniq, na, uvalid)
        # clear children lists (host does this after the merge scan)
        hits_j = s.hits_j.at[clip_ids(c0)].set(-1).at[clip_ids(c1)].set(-1)
        age_new = (s.age[clip_ids(c0)] + s.age[clip_ids(c1)] + 1) // 2 + 1
        age = s.age.at[newnode].set(age_new)
        s = s._replace(hits_j=hits_j, age=age)

        b_use = (n_unique == na - 1) | (
            (age_new <= age_limit) & (n_unique >= refresh_thresh))

        def use_branch(s):
            key = jnp.where(uvalid, uc, BIG)
            order = jnp.argsort(key, stable=True)
            kept = order[:m]
            ok = key[kept] < BIG
            hj = jnp.where(ok, uniq[kept], -1).astype(jnp.int32)
            hd = jnp.where(ok, ud[kept], 0.0)
            s = s._replace(
                hits_j=s.hits_j.at[newnode].set(hj),
                hits_d=s.hits_d.at[newnode].set(hd),
                vis_j=s.vis_j.at[newnode].set(hj[0]),
                vis_d=s.vis_d.at[newnode].set(hd[0]))
            s = update_top_visible(s, newnode, hj[0], hd[0], na)
            return update_visible(s, newnode, hj, hd,
                                  jnp.where(ok, uc[kept], BIG), na)

        def refresh_branch(s):
            return refresh_node(s, newnode, na)

        return jax.lax.cond(b_use, use_branch, refresh_branch, s)

    def refresh_node(s, newnode, na):
        """Full top-hit refresh of newnode (ref topHitJoin :4438-4517)."""
        s = s._replace(age=s.age.at[newnode].set(0),
                       ctr=_ctr_add(s.ctr, C_REFRESH, 1))
        nodes = jnp.arange(M, dtype=jnp.int32)
        act = is_active(s, nodes)
        # set_out_distance(active, na) non-forced
        mask = act & (s.noda != na)
        s = force_refresh(s, nodes, mask, na)
        # one-vs-all scan of newnode: main store directly, then overlay the
        # side rows' results (per-row contractions are row-local, so this is
        # value-identical to a contiguous-store scan without materialising a
        # merged full-store copy)
        u_new, w_new = row_uw(s, jnp.asarray([newnode], dtype=jnp.int32))
        if two_tier:
            d_leaf, w_leaf = kernels.me_dist_many_codes(
                codes_m[:n_seqs], u_new[0], w_new[0], ev_cd, f(code_freq), cd)
            d_int, w_int_d = kernels.me_dist_many_2d(f(U_m), f(W_m), u_new[0],
                                                     w_new[0], ev_cd)
            d_all = jnp.concatenate([d_leaf, d_int])[:M]
            wt_all = jnp.concatenate([w_leaf, w_int_d])[:M]
        else:
            d_all, wt_all = kernels.me_dist_many_2d(f(U_m), f(W_m), u_new[0],
                                                    w_new[0], ev_cd)
            d_all, wt_all = d_all[:M], wt_all[:M]
        d_side, w_side = kernels.me_dist_many_2d(f(s.side_u), f(s.side_w),
                                                 u_new[0], w_new[0], ev_cd)
        _, side_ids = side_mask(s)
        stgt = jnp.where(side_ids < s.maxnode, side_ids, M)
        d_all = d_all.at[stgt].set(d_side, mode="drop")
        wt_all = wt_all.at[stgt].set(w_side, mode="drop")
        dist = d_all - (s.diameter[newnode] + s.diameter)
        dist = add_penalty(s, dist, jnp.full((M,), newnode, jnp.int32), nodes)
        s = s._replace(ctr=_ctr_add(s.ctr, C_PROF, jnp.sum(act)))
        crit = dist - (scaled_out(s, nodes, na)
                       + scaled_out(s, jnp.full((M,), newnode), na)) \
            / (na.astype(cd) - 2)
        key = jnp.where(act & (nodes != newnode), crit, BIG)
        order = jnp.argsort(key, stable=True).astype(jnp.int32)
        kept = order[:m]
        ok = key[kept] < BIG
        hj = jnp.where(ok, kept, -1).astype(jnp.int32)
        hd = jnp.where(ok, dist[kept], 0.0)
        s = s._replace(hits_j=s.hits_j.at[newnode].set(hj),
                       hits_d=s.hits_d.at[newnode].set(hd),
                       vis_j=s.vis_j.at[newnode].set(hj[0]),
                       vis_d=s.vis_d.at[newnode].set(hd[0]))

        if "exp" in ablate:
            return reset_top_visible(s, na)
        # neighbor list expansion over the m top hits (batched like the host:
        # every expansion reads pre-update lists; row writes are disjoint)
        top_js = s.hits_j[newnode]
        jvalid = (top_js >= 0) & is_active(s, top_js) \
            & (s.hits_j[clip_ids(top_js)][:, 0] >= 0)
        jtgt = jnp.where(jvalid, clip_ids(top_js), M)
        s = s._replace(age=s.age.at[jtgt].set(0, mode="drop"))

        both = jnp.concatenate([
            s.hits_j[clip_ids(top_js)],                      # [m, m]
            jnp.broadcast_to(jnp.asarray(newnode, jnp.int32), (m, 1)),
            jnp.broadcast_to(s.hits_j[newnode], (m, m)),
        ], axis=1)                                           # [m, 2m+1]
        uniq_rows, _ = jax.vmap(
            lambda c, ex: unique_anc(s, c, ex))(both, top_js)
        L = uniq_rows.shape[1]
        iis = jnp.repeat(top_js, L)
        jjs = uniq_rows.reshape(-1)
        pvalid = (jjs >= 0) & jnp.repeat(jvalid, L)
        s, pd, pw, pc = dist_crit(s, clip_ids(iis), clip_ids(jjs), na, pvalid)
        pd = pd.reshape(m, L)
        pc = jnp.where(pvalid, pc, BIG).reshape(m, L)
        order2 = jnp.argsort(pc, axis=1, stable=True)
        keptk = order2[:, :m]
        okk = jnp.take_along_axis(pc, keptk, axis=1) < BIG
        hjk = jnp.where(okk, jnp.take_along_axis(uniq_rows, keptk, axis=1),
                        -1).astype(jnp.int32)
        hdk = jnp.where(okk, jnp.take_along_axis(pd, keptk, axis=1), 0.0)
        hits_j = s.hits_j.at[jtgt].set(hjk, mode="drop")
        hits_d = s.hits_d.at[jtgt].set(hdk, mode="drop")
        vis_j = s.vis_j.at[jtgt].set(hjk[:, 0], mode="drop")
        vis_d = s.vis_d.at[jtgt].set(hdk[:, 0], mode="drop")
        s = s._replace(hits_j=hits_j, hits_d=hits_d, vis_j=vis_j, vis_d=vis_d)
        return reset_top_visible(s, na)

    # ------------------------------------------------------------- main loop
    def body(s):
        na = s.n_active
        if "nowork" in ablate:       # perf floor: while-loop + carry only
            k = s.nj_done
            return s._replace(n_active=na - 1, maxnode=s.maxnode + 1,
                              ji=s.ji.at[k].set(0), jj=s.jj.at[k].set(1),
                              nj_done=k + 1)
        if "search" in ablate:       # perf floor: skip the search phase
            nodes = jnp.arange(M, dtype=jnp.int32)
            act = is_active(s, nodes)
            ji = jnp.argmax(act).astype(jnp.int32)
            jj = jnp.argmax(act.at[clip_ids(ji)].set(False)).astype(jnp.int32)
        else:
            s, ji, jj, jd, jc = search(s, na)
        s, newnode = do_join(s, ji, jj, na)
        if "thj" not in ablate:
            s = top_hit_join(s, newnode, ji, jj, na - 1)
        return s._replace(n_active=na - 1)

    def cond(s):
        return (s.n_active > 3) & (s.nj_done < seg_end)

    return jax.lax.while_loop(cond, body, s)


@functools.partial(jax.jit, static_argnames=("n_seqs", "two_tier"),
                   donate_argnums=(0, 1, 2))
def _merge_seg(codes_m, W_m, U_m, side_c, side_w, side_u, seg_base, count,
               n_seqs, two_tier):
    """Scatter a finished segment's side rows into the (donated) main store.

    Enqueued between epoch dispatches; the single device stream serialises
    it before the next segment's reads, so the whole join phase still costs
    one blocking fetch."""
    S = side_w.shape[0]
    ids = seg_base + jnp.arange(S, dtype=jnp.int32)
    ok = jnp.arange(S) < count
    ctgt = jnp.where(ok, ids, codes_m.shape[0])
    codes_m = codes_m.at[ctgt].set(side_c, mode="drop")
    phys = ids - n_seqs if two_tier else ids
    ptgt = jnp.where(ok, phys, W_m.shape[0])
    W_m = W_m.at[ptgt].set(side_w, mode="drop")
    U_m = U_m.at[ptgt].set(side_u, mode="drop")
    return codes_m, W_m, U_m


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------


def epoch_supported(nj, tophits) -> bool:
    opts = nj.options
    return (tophits is not None and not opts.slow
            and not opts.fastest and not opts.use_tophits_2nd
            and tophits.q == 0)


def run_epoch(nj, tophits, max_joins=None) -> None:
    """Build device state from the host NJ/top-hits state, run the whole join
    loop on device, and apply the results back to the host structures."""
    opts = nj.options
    prof = nj.prof
    tree = nj.tree
    M = nj.maxnodes
    m = tophits.m
    ntv = len(tophits.topvisible)
    up = _accum_dtype()
    cd = np.float64 if up is not None else prof.dtype
    n_joins = nj.n_seqs - 3

    hits_j = np.full((M, m), -1, dtype=np.int32)
    hits_d = np.zeros((M, m), dtype=cd)
    for i in range(M):
        hj = tophits.hits_j[i]
        if hj is not None:
            hits_j[i, : len(hj)] = hj
            hits_d[i, : len(hj)] = tophits.hits_dist[i][: len(hj)]

    import os as _os
    S = int(_os.environ.get("VFT_EPOCH_SEG", "256"))
    P = prof.W.shape[1]
    C = prof.U.shape[2]
    store_dt = prof.W.dtype

    s = EpochState(
        side_c=jnp.zeros((S, P), dtype=prof.codes.dtype),
        side_w=jnp.zeros((S, P), dtype=store_dt),
        side_u=jnp.zeros((S, P * C), dtype=store_dt),
        w_out=prof.w_out, f_out=prof.f_out,
        od=jnp.asarray(nj.out_distances, dtype=cd),
        noda=jnp.asarray(np.minimum(nj.n_out_dist_active, 2**31 - 1),
                         dtype=jnp.int32),
        selfdist=jnp.asarray(nj.selfdist, dtype=cd),
        selfweight=jnp.asarray(nj.selfweight, dtype=cd),
        diameter=jnp.asarray(nj.diameter, dtype=cd),
        vard=jnp.asarray(nj.var_diameter, dtype=cd),
        totdiam=jnp.asarray(nj.totdiam, dtype=cd),
        parent=jnp.asarray(tree.parent, dtype=jnp.int32),
        con_on=jnp.asarray(nj.con_on if nj.n_cons else
                           np.zeros((M, 0)), dtype=jnp.int32),
        con_off=jnp.asarray(nj.con_off if nj.n_cons else
                            np.zeros((M, 0)), dtype=jnp.int32),
        hits_j=jnp.asarray(hits_j), hits_d=jnp.asarray(hits_d),
        age=jnp.asarray(tophits.age, dtype=jnp.int32),
        vis_j=jnp.asarray(tophits.visible_j, dtype=jnp.int32),
        vis_d=jnp.asarray(tophits.visible_dist, dtype=cd),
        tv=jnp.asarray(tophits.topvisible, dtype=jnp.int32),
        tv_age=jnp.int32(tophits.topvisible_age),
        n_active=jnp.int32(int(nj.active_mask().sum())),
        maxnode=jnp.int32(tree.maxnode),
        na_reset=jnp.int32(nj.n_seqs),
        ji=jnp.full((n_joins,), -1, dtype=jnp.int32),
        jj=jnp.full((n_joins,), -1, dtype=jnp.int32),
        bli=jnp.zeros((n_joins,), dtype=cd),
        blj=jnp.zeros((n_joins,), dtype=cd),
        nj_done=jnp.int32(0),
        ctr=jnp.zeros((8, 2), dtype=jnp.uint32),
    )

    refresh_thresh = int(0.5 + m * opts.tophits_refresh)
    age_limit = max(1, int(0.5 + np.log2(m)))
    ablate = frozenset(x for x in
                       _os.environ.get("VFT_EPOCH_ABLATE", "").split(",") if x)
    cout_on = jnp.asarray(nj.con_out_on if nj.n_cons else np.zeros(0),
                          dtype=jnp.int32)
    cout_off = jnp.asarray(nj.con_out_off if nj.n_cons else np.zeros(0),
                           dtype=jnp.int32)

    # segment loop: epoch dispatch (side-buffer staging) alternating with the
    # merge scatter, all enqueue-only -- see module docstring
    n_active0 = int(s.n_active)
    total = n_active0 - 3
    if max_joins is not None:
        total = min(total, max_joins)
    codes_m, W_m = prof.codes, prof.W
    # 2D view of the store for the epoch (one transpose copy per call; the
    # 3D layout would otherwise force a 32x-padded copy inside the program)
    u_shape3 = prof.U.shape
    U_m = prof.U.reshape(u_shape3[0], -1)
    maxnode0 = tree.maxnode
    done = 0
    out = s
    while done < total:
        seg = min(S, total - done)
        seg_base = maxnode0 + done
        out = _epoch_run(
            out, codes_m, W_m, U_m, jnp.int32(seg_base),
            jnp.int32(done + seg),
            prof.code_freq, prof.eigenval, prof.eigentot, cout_on, cout_off,
            n_seqs=prof.n_seqs, use_matrix=prof.use_matrix,
            two_tier=prof.two_tier, tol=prof.tol, bionj=bool(opts.bionj),
            m=m, ntv=ntv, stale_limit=float(opts.stale_out_limit),
            refresh_thresh=refresh_thresh, age_limit=age_limit,
            reset_n=int(opts.n_reset_out_profile),
            reset_f=float(opts.f_reset_out_profile), up=up, ablate=ablate,
            n_cons=int(nj.n_cons),
            con_weight=float(opts.constraint_weight))
        codes_m, W_m, U_m = _merge_seg(
            codes_m, W_m, U_m, out.side_c, out.side_w, out.side_u,
            jnp.int32(seg_base), jnp.int32(seg),
            n_seqs=prof.n_seqs, two_tier=prof.two_tier)
        done += seg

    # ONE blocking fetch for the whole epoch
    ji = np.asarray(out.ji)
    jj = np.asarray(out.jj)
    bli = np.asarray(out.bli, dtype=np.float64)
    blj = np.asarray(out.blj, dtype=np.float64)
    n_done = int(out.nj_done)

    # store arrays stay device-resident (main store carries the merged rows)
    prof.codes, prof.W = codes_m, W_m
    prof.U = U_m.reshape(u_shape3)
    prof.w_out, prof.f_out = out.w_out, out.f_out
    prof.out_version += 1

    nj.out_distances = np.asarray(out.od, dtype=np.float64)
    nj.n_out_dist_active = np.asarray(out.noda, dtype=np.int64)
    nj.selfdist = np.asarray(out.selfdist, dtype=np.float64)
    nj.selfweight = np.asarray(out.selfweight, dtype=np.float64)
    nj.diameter = np.asarray(out.diameter, dtype=np.float64)
    nj.var_diameter = np.asarray(out.vard, dtype=np.float64)
    nj.totdiam = float(out.totdiam)
    if nj.n_cons:
        nj.con_on = np.asarray(out.con_on, dtype=np.int64)
        nj.con_off = np.asarray(out.con_off, dtype=np.int64)

    for k in range(n_done):
        i, j = int(ji[k]), int(jj[k])
        newnode = tree.maxnode
        tree.maxnode += 1
        tree.set_children(newnode, [min(i, j), max(i, j)])
        tree.branchlength[i] = bli[k]
        tree.branchlength[j] = blj[k]
        nj.join_log.append((i, j))

    # host debug counters from the device tally
    c = np.asarray(out.ctr, dtype=np.uint64)
    ctr = c[:, 0] + (c[:, 1] << np.uint64(32))
    nj.debug.outprofile_ops += int(ctr[C_OUT])
    nj.debug.profile_ops += int(ctr[C_PROF])
    nj.debug.seq_ops += int(ctr[C_SEQ])
    nj.debug.profile_avg_ops += int(ctr[C_AVG])
    nj.debug.n_hill_better += int(ctr[C_HILL])
    nj.debug.n_visible_update += int(ctr[C_VISUP])
    nj.debug.n_refresh_tophits += int(ctr[C_REFRESH])

    # sync residual top-hits host state (stale but coherent for any fallback)
    tophits.visible_j = np.asarray(out.vis_j, dtype=np.int64)
    tophits.visible_dist = np.asarray(out.vis_d, dtype=np.float64)
    tophits.topvisible = np.asarray(out.tv, dtype=np.int64)
    tophits.topvisible_age = int(out.tv_age)
    tophits.age = np.asarray(out.age, dtype=np.int64)
    hj_all = np.asarray(out.hits_j)
    hd_all = np.asarray(out.hits_d, dtype=np.float64)
    for i in range(M):
        row = hj_all[i]
        valid = row >= 0
        if valid.any():
            tophits.hits_j[i] = row[valid].astype(np.int64)
            tophits.hits_dist[i] = hd_all[i][valid]
        else:
            tophits.hits_j[i] = None
            tophits.hits_dist[i] = None
