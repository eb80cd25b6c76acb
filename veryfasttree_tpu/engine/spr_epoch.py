"""Device-resident SPR rounds: one enqueue-only dispatch per node.

The serial SPR phase (engine/spr.py, ref SPR tcc:6315-6404 + findSPRSteps
:1805-1858 + unwindSPRStep :1861-1879) makes one blocking device fetch per
chain step -- ~46k per `-noml` run at N=2000 -- which makes the full
pipeline uncompletable on the remote-TPU backend (round-4 finding).  This
module moves each node's WHOLE SPR processing (4 chains x <= maxSPRLength
steps, best-prefix acceptance, unwind, profile repairs, the post-accept
ancestor recompute walk) into ONE jitted dispatch; the host iterates the
round's snapshot postorder list and enqueues one `_spr_node` call per node
-- ZERO fetches inside the round, one small fetch of the tree arrays at
the end.

Memory design (docs/SPR_EPOCH_DESIGN.md; the join epoch's copy-insertion
lesson): the profile store is a READ-ONLY jit argument; chain-step profile
writes (updateForNNI averages, up-profile memo fills) go into a small
[V, ...] override buffer keyed by row id, and each `_spr_node` dispatch
FIRST folds the previous node's overrides into the (donated) main store --
a pure scatter outside all loops, so no `lax.cond` ever reads an array the
same loop body writes.  All control flow is `lax.while_loop`/`fori_loop`
with masked writes; there are no lax.conds in the hot path at all.

Up-profiles reproduce the host UpProfiles MEMOIZATION exactly (a validity
bitmask carried across nodes within the round, invalidation sets identical
to rearrange.update_for_nni, reset_all on acceptance): the cached values
are deliberately stale in the same way the reference's are, which is what
bit-exactness against engine/spr.py requires (ref getUpProfile
tcc:3382-3434, updateForNNI :1882-1927).

tests/test_spr_epoch.py asserts tree-and-store identity with the host
serial path on CPU float64.  Not covered (host fallback): -slow (needs
whole-tree length re-checks per acceptance, ref tcc:6267-6284).

-bionj caveat: the BIONJ quartet weight flows through log1p, where numpy
(host) and XLA (device) differ at ulp level, so device-bionj profile rows
are ~1e-7-close rather than bit-identical to the host (equal-quality
tier); default runs (bionj off) are bit-exact.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import kernels
from .epoch import _ctr_add
from .profiles import _accum_dtype, fetch_np

# counter slots (local to this module's [8, 2] tally)
K_PROF, K_AVG, K_SPR = 0, 1, 2


class SprEpochState(NamedTuple):
    # override buffer: profile rows written during the CURRENT node's
    # processing, folded into the main store at the next dispatch's entry
    ov_ids: jax.Array    # [V] i32 row ids (-1 empty)
    ov_c: jax.Array      # [V, P] int8
    ov_w: jax.Array      # [V, P] store dtype
    ov_u: jax.Array      # [V, P*C] store dtype
    ov_n: jax.Array      # i32 rows used
    ov_flow: jax.Array   # bool: overflow happened (results invalid)
    # tree topology (ref NeighbourJoining.h:294-299 flat arrays)
    parent: jax.Array    # [M] i32
    child: jax.Array     # [M, 3] i32
    nch: jax.Array       # [M] i32
    # up-profile memo validity (host UpProfiles.valid)
    uvalid: jax.Array    # [M] bool
    # constraints (empty [M, 0] when unconstrained)
    con_on: jax.Array
    con_off: jax.Array
    # counters: [K_PROF, K_AVG, K_SPR] as (lo, hi) u32 pairs
    ctr: jax.Array       # [8, 2] u32


def _merge_ov(codes_m, W_m, U_m, ov_ids, ov_c, ov_w, ov_u, ov_n,
              n_seqs, two_tier):
    """Scatter override rows into the store (row ids unique by construction)."""
    V = ov_ids.shape[0]
    ok = jnp.arange(V) < ov_n
    ctgt = jnp.where(ok, ov_ids, codes_m.shape[0])
    codes_m = codes_m.at[ctgt].set(ov_c, mode="drop")
    phys = ov_ids - n_seqs if two_tier else ov_ids
    ptgt = jnp.where(ok, phys, W_m.shape[0])
    W_m = W_m.at[ptgt].set(ov_w, mode="drop")
    U_m = U_m.at[ptgt].set(ov_u, mode="drop")
    return codes_m, W_m, U_m


_SPR_STATICS = ("n_seqs", "maxnodes", "use_matrix", "two_tier", "tol",
                "bionj", "logdist", "jc", "pseudo", "max_spr_len",
                "n_cons", "con_weight", "up", "do_merge", "lanes4")


def _spr_node_impl(s: SprEpochState, codes_m, W_m, U_m, node_move, root,
              code_freq, eigenval, eigentot,
              n_seqs, maxnodes, use_matrix, two_tier, tol, bionj, logdist,
              jc, pseudo, max_spr_len, n_cons, con_weight, up=None,
              do_merge=True, lanes4=True):
    """Optionally fold accumulated overrides into the store, then run one
    node's full SPR processing (ref traverseSPR tcc:6185-6313 body).

    do_merge=False skips the entry scatter: reads layer through the
    row-id-keyed override buffer, so merging only every K nodes is
    value-identical as long as the buffer does not overflow (the host
    wrapper sizes K from V and the tree depth; ov_flow is the backstop)."""
    M = maxnodes
    V = s.ov_ids.shape[0]
    n_rows = codes_m.shape[0]
    Pp = W_m.shape[1]
    C = code_freq.shape[1]
    store_dt = W_m.dtype
    cd = up if up is not None else store_dt
    ev = eigenval if use_matrix else None
    ev_cd = ev.astype(cd) if ev is not None else None
    et = eigentot if use_matrix else None

    # ---- entry merge: accumulated writes -> donated main store ------------
    if do_merge:
        codes_m, W_m, U_m = _merge_ov(codes_m, W_m, U_m, s.ov_ids, s.ov_c,
                                      s.ov_w, s.ov_u, s.ov_n, n_seqs,
                                      two_tier)
        s = s._replace(ov_ids=jnp.full((V,), -1, jnp.int32),
                       ov_n=jnp.int32(0))

    def f(x):
        return x.astype(cd)

    def clipM(x):
        return jnp.clip(x, 0, M - 1).astype(jnp.int32)

    # ---------------------------------------------------------- row access
    def read_cwu(s, rows):
        """(codes, w, u[K,P,C]) for row ids in [0, 2*maxnodes), override-
        aware, two-tier leaf expansion inside (profiles._rows_cwu analog)."""
        rc = jnp.clip(rows, 0, n_rows - 1).astype(jnp.int32)
        c_m = codes_m[rc]
        if two_tier:
            is_leaf = rc < n_seqs
            ph = jnp.clip(rc - n_seqs, 0, W_m.shape[0] - 1)
            w_i = W_m[ph]
            u_i = U_m[ph].reshape(-1, Pp, C)
            u_l, w_l = kernels.leaf_u(c_m, code_freq, U_m.dtype)
            w_m = jnp.where(is_leaf[:, None], w_l, w_i)
            u_m = jnp.where(is_leaf[:, None, None], u_l, u_i)
        else:
            w_m = W_m[rc]
            u_m = U_m[rc].reshape(-1, Pp, C)
        eq = s.ov_ids[None, :] == rc[:, None]            # [K, V]
        has = eq.any(axis=1)
        slot = jnp.argmax(eq, axis=1)
        c = jnp.where(has[:, None], s.ov_c[slot], c_m)
        w = jnp.where(has[:, None], s.ov_w[slot], w_m)
        u = jnp.where(has[:, None, None],
                      s.ov_u[slot].reshape(-1, Pp, C), u_m)
        return c, w, u

    def write_row(s, row, c, w, u2, active):
        """Stage a profile-row write in the override buffer (in-place
        overwrite when the row already has a slot)."""
        eq = s.ov_ids == row
        found = eq.any()
        slot = jnp.where(found, jnp.argmax(eq), jnp.minimum(s.ov_n, V - 1))
        slot = jnp.where(active, slot, V)
        flow = s.ov_flow | (active & ~found & (s.ov_n >= V))
        return s._replace(
            ov_ids=s.ov_ids.at[slot].set(row.astype(jnp.int32), mode="drop"),
            ov_c=s.ov_c.at[slot].set(c, mode="drop"),
            ov_w=s.ov_w.at[slot].set(w, mode="drop"),
            ov_u=s.ov_u.at[slot].set(u2, mode="drop"),
            ov_n=jnp.where(active & ~found, s.ov_n + 1, s.ov_n),
            ov_flow=flow)

    # ------------------------------------------------------- tree helpers
    def sib_of(s, node):
        """Unique sibling (caller guarantees parent exists, n_child==2)."""
        p = clipM(s.parent[clipM(node)])
        ch = s.child[p]
        return jnp.where(ch[0] == node, ch[1], ch[0]).astype(jnp.int32)

    def rsibs(s, node):
        """The other two children of the (3-child) root, in slot order
        (ref rootSiblings tcc:1991-2003)."""
        ch = s.child[clipM(root)]
        m = ch != node
        i0 = jnp.argmax(m)
        i1 = jnp.argmax(m.at[i0].set(False))
        return ch[i0].astype(jnp.int32), ch[i1].astype(jnp.int32)

    def replace_child(s, par, old, new):
        """ref replaceChild tcc:1930-1940 (parent[old] left stale, as host)."""
        pc = clipM(par)
        row = s.child[pc]
        k = jnp.argmax(row == old)
        return s._replace(parent=s.parent.at[clipM(new)].set(pc),
                          child=s.child.at[pc, k].set(new.astype(jnp.int32)))

    # --------------------------------------------------- corrected distances
    def log_corr(d):
        """nj.log_corrected (ref logCorrect tcc:322-330) in cd dtype."""
        maxscore = 3.0
        if jc:
            out = jnp.where(
                d < 0.74,
                -0.75 * jnp.log1p(-jnp.minimum(d, 0.7399) * (4.0 / 3.0)),
                maxscore)
        else:
            out = jnp.where(d < 0.99,
                            -1.3 * jnp.log1p(-jnp.minimum(d, 0.9899)),
                            maxscore)
        return jnp.minimum(out, maxscore)

    P6_I = jnp.asarray([0, 0, 0, 1, 1, 2])
    P6_J = jnp.asarray([1, 2, 3, 2, 3, 3])

    def corrected6(s, r4):
        """corrected_pair_distances over the 6 pairs of 4 rows
        (rearrange.corrected_pair_distances, ref tcc:1460-1488).  One 4-row
        store read; the 6 pair operands index the small tile."""
        _, w4, u4 = read_cwu(s, r4)
        d, wt = kernels.me_dist_rows(f(u4[P6_I]), f(w4[P6_I]),
                                     f(u4[P6_J]), f(w4[P6_J]), ev_cd)
        wt = jnp.where(wt > 0, wt, 0.01)
        if pseudo > 0:
            # explicit sequential sums to match numpy's small-n order
            bottom = wt[0] + wt[1] + wt[2] + wt[3] + wt[4] + wt[5]
            dw = d * wt
            top = dw[0] + dw[1] + dw[2] + dw[3] + dw[4] + dw[5]
            prior = jnp.where(bottom > 0.01, top / bottom, 3.0)
            d = (d * wt + prior * pseudo) / (wt + pseudo)
        if logdist:
            d = log_corr(d)
        return d

    def qweight(s, r4, active):
        """BIONJ quartet weight (ref quartetWeight tcc:3541-3561); -1 when
        bionj is off.  Counts 6 profile ops like the host."""
        if not bionj:
            return s, jnp.asarray(-1.0, cd)
        d = corrected6(s, r4)
        s = s._replace(ctr=_ctr_add(s.ctr, K_PROF, jnp.where(active, 6, 0)))
        w = 0.5 + ((d[3] + d[4]) - (d[1] + d[2])) / (4.0 * d[0])
        w = jnp.clip(w, 0.0, 1.0)
        return s, jnp.where(d[0] < 0.01, jnp.asarray(-1.0, cd), w)

    def quartet_pen(s, nodes4):
        """rearrange.quartet_constraint_penalties (ref tcc:1490-1522)."""
        if not n_cons:
            return jnp.zeros((3,), cd)
        n4 = clipM(jnp.stack(nodes4))
        on = s.con_on[n4]                       # [4, n_cons]
        off = s.con_off[n4]
        tot = on + off
        n_plus = ((on > 0) & (off == 0)).sum(axis=0)
        n_minus = ((off > 0) & (on == 0)).sum(axis=0)
        relevant = (tot > 0).all(axis=0) & (n_plus < 3) & (n_minus < 3)
        fr = jnp.where(tot > 0, on.astype(cd)
                       / jnp.where(tot > 0, tot, 1).astype(cd), 0.0)

        def pd(i, j):
            return fr[i] + fr[j] - 2.0 * fr[i] * fr[j]

        w = con_weight
        return jnp.stack([
            jnp.sum(jnp.where(relevant, w * (pd(0, 1) + pd(2, 3)), 0.0)),
            jnp.sum(jnp.where(relevant, w * (pd(0, 2) + pd(1, 3)), 0.0)),
            jnp.sum(jnp.where(relevant, w * (pd(0, 3) + pd(2, 1)), 0.0)),
        ]).astype(cd)

    # ------------------------------------------------------- up-profiles
    DMAX = M

    def avg_into(s, row_dst, r_i, r_j, bw_cd, active):
        """set_from_average(row_dst, r_i, r_j, weight) through the override
        buffer (profiles._join_update math on store dtype)."""
        c1, w1, u1 = read_cwu(s, jnp.stack([r_i, r_j]))
        cA, wA, uA, _ = kernels.average_profile(
            c1[0], w1[0], u1[0], c1[1], w1[1], u1[1],
            jnp.where(bw_cd < 0, 0.5, bw_cd).astype(store_dt),
            code_freq, et, tol)
        return write_row(s, row_dst, cA, wA, uA.reshape(-1), active)

    def ups_ensure(s, node, active):
        """Host UpProfiles.get(node) (ref getUpProfile tcc:3382-3434):
        fill every INVALID memo entry on node's root path, top-down.  The
        loop trip count is the number of invalid entries (usually 0-6)."""
        def wcond(c):
            _, n, _ = c
            return n >= 0

        def wbody(c):
            path, n, k = c
            path = path.at[jnp.minimum(k, DMAX - 1)].set(n)
            return path, s.parent[clipM(n)], k + 1

        path0 = jnp.full((DMAX,), -1, jnp.int32)
        n0 = jnp.where(active, node.astype(jnp.int32), jnp.int32(-1))
        path, _, L = jax.lax.while_loop(wcond, wbody,
                                        (path0, n0, jnp.int32(0)))

        def skip_valid(s, k):
            """Largest k' <= k whose path entry is invalid (scalar walk)."""
            def c2(k2):
                n2 = path[jnp.clip(k2, 0, DMAX - 1)]
                return (k2 >= 0) & s.uvalid[clipM(n2)]

            return jax.lax.while_loop(c2, lambda k2: k2 - 1, k)

        def ocond(c):
            _, k = c
            return k >= 0

        def obody(c):
            s, k = c
            n = path[jnp.clip(k, 0, DMAX - 1)]
            par = path[jnp.clip(k + 1, 0, DMAX - 1)]
            a = s.child[clipM(n), 0]
            b = s.child[clipM(n), 1]
            pr_root = par == root
            r0, r1 = rsibs(s, n)
            cc = jnp.where(pr_root, r0, sib_of(s, n))
            d_row = jnp.where(pr_root, r1, maxnodes + par)
            # weight from the CDAB-ordered quartet (ref tcc:3421-3428)
            s, w = qweight(s, jnp.stack([cc, d_row, a, b]), jnp.bool_(True))
            s = avg_into(s, maxnodes + n, cc, d_row, w, jnp.bool_(True))
            s = s._replace(uvalid=s.uvalid.at[clipM(n)].set(True))
            return s, skip_valid(s, k - 1)

        start = jnp.where(active, L - 2, jnp.int32(-1))
        k0 = skip_valid(s, start)
        s, _ = jax.lax.while_loop(ocond, obody, (s, k0))
        return s

    def setup_abcd(s, node, active):
        """ref setupABCD tcc:1942-1974: quartet corner NODES and profile ROWS
        (the D row is the parent's up-profile when the parent is not root)."""
        par = s.parent[clipM(node)]
        a = s.child[clipM(node), 0]
        b = s.child[clipM(node), 1]
        pr_root = par == root
        r0, r1 = rsibs(s, node)
        cc = jnp.where(pr_root, r0, sib_of(s, node))
        dd = jnp.where(pr_root, r1, par)
        s = ups_ensure(s, par, active & ~pr_root & (par >= 0))
        d_row = jnp.where(pr_root, r1, maxnodes + par)
        return s, (a, b, cc, dd), jnp.stack([a, b, cc, d_row])

    # ----------------------------------------------------- profile repairs
    def recompute_profile(s, node, active):
        """ref recomputeProfile tcc:3436-3472 (ME path)."""
        act = active & (node >= n_seqs) & (node != root)
        if bionj:
            s, _, r4 = setup_abcd(s, node, act)
            s, w = qweight(s, r4, act)
        else:
            w = jnp.asarray(-1.0, cd)
        c0 = s.child[clipM(node), 0]
        c1 = s.child[clipM(node), 1]
        s = avg_into(s, clipM(node), c0, c1, w, act)
        s = s._replace(ctr=_ctr_add(s.ctr, K_AVG, jnp.where(act, 1, 0)))
        if n_cons:
            tgt = jnp.where(act, clipM(node), M)
            s = s._replace(
                con_on=s.con_on.at[tgt].set(
                    s.con_on[clipM(c0)] + s.con_on[clipM(c1)], mode="drop"),
                con_off=s.con_off.at[tgt].set(
                    s.con_off[clipM(c0)] + s.con_off[clipM(c1)], mode="drop"))
        return s

    def update_for_nni(s, node, active):
        """ref updateForNNI tcc:1882-1927 (fast path; -slow is excluded)."""
        par = s.parent[clipM(node)]
        a = s.child[clipM(node), 0]
        b = s.child[clipM(node), 1]
        pr_root = par == root
        r0, r1 = rsibs(s, node)
        nb0 = jnp.where(pr_root, r0, par)
        nb1 = jnp.where(pr_root, r1, sib_of(s, node))
        gp = s.parent[clipM(par)]
        unc_ok = (~pr_root) & (gp >= 0) & (gp != root)
        uncle = jnp.where(unc_ok, sib_of(s, par), jnp.int32(-1))
        ids = jnp.stack([node.astype(jnp.int32), a, b, nb0, nb1, uncle])
        tgt = jnp.where(active & (ids >= 0), clipM(ids), M)
        s = s._replace(uvalid=s.uvalid.at[tgt].set(False, mode="drop"))
        if bionj:
            s = recompute_profile(s, node, active)
            s = recompute_profile(s, par, active)
            return s
        # bionj off (default): fuse the two 0.5-averages -- one 3-row read
        # (a, b, node's sibling), the parent average chained directly on the
        # fresh node average (no override read-back).  average_profile with
        # bw=0.5 is argument-order-commutative bitwise (0.5*w1 + 0.5*w2 and
        # the code-keep rules are symmetric), so the result is identical to
        # the host's (child0, child1)-ordered calls.
        act_node = active & (node >= n_seqs) & (node != root)
        act_par = active & (par >= n_seqs) & (par != root) & (par >= 0)
        c3, w3, u3 = read_cwu(s, jnp.stack([a, b, nb1]))
        half = jnp.asarray(0.5, store_dt)
        cN, wN, uN, _ = kernels.average_profile(
            c3[0], w3[0], u3[0], c3[1], w3[1], u3[1], half, code_freq, et, tol)
        cP, wP, uP, _ = kernels.average_profile(
            cN, wN, uN, c3[2], w3[2], u3[2], half, code_freq, et, tol)
        s = write_row(s, clipM(node), cN, wN, uN.reshape(-1), act_node)
        s = write_row(s, clipM(par), cP, wP, uP.reshape(-1), act_par)
        s = s._replace(ctr=_ctr_add(s.ctr, K_AVG,
                                    jnp.where(act_node, 1, 0)
                                    + jnp.where(act_par, 1, 0)))
        if n_cons:
            tn = jnp.where(act_node, clipM(node), M)
            s = s._replace(
                con_on=s.con_on.at[tn].set(
                    s.con_on[clipM(a)] + s.con_on[clipM(b)], mode="drop"),
                con_off=s.con_off.at[tn].set(
                    s.con_off[clipM(a)] + s.con_off[clipM(b)], mode="drop"))
            tp2 = jnp.where(act_par, clipM(par), M)
            s = s._replace(
                con_on=s.con_on.at[tp2].set(
                    s.con_on[clipM(node)] + s.con_on[clipM(nb1)], mode="drop"),
                con_off=s.con_off.at[tp2].set(
                    s.con_off[clipM(node)] + s.con_off[clipM(nb1)],
                    mode="drop"))
        return s

    # ------------------------------------------------------------- chains
    Lmax = max_spr_len

    def chain_forward(s, around0, ac_first, enabled):
        """findSPRSteps + best-prefix, NO unwinding (ref tcc:1805-1858,
        6236-6260).  Returns (s, n0s, n1s, n_steps, best)."""
        n0s = jnp.zeros((Lmax,), jnp.int32)
        n1s = jnp.zeros((Lmax,), jnp.int32)
        deltas = jnp.zeros((Lmax,), cd)

        def ccond(c):
            s, around, k, *_ = c
            return (k < Lmax) & (s.nch[clipM(around)] == 2)

        def cbody(c):
            s, around, k, n0s, n1s, deltas = c
            s, (a, b, cc, dd), r4 = setup_abcd(s, around, jnp.bool_(True))
            d6 = corrected6(s, r4)
            s = s._replace(ctr=_ctr_add(s.ctr, K_PROF, 6))
            pen = quartet_pen(s, (a, b, cc, dd))
            crit = jnp.stack([d6[0] + d6[5], d6[1] + d6[4],
                              d6[2] + d6[3]]) + pen
            use_ac = jnp.where(k == 0, ac_first, crit[1] < crit[2])
            n0 = jnp.where(use_ac, b, a)
            n1 = cc
            delta = jnp.where(use_ac, crit[1] - crit[0], crit[2] - crit[0])
            n0s = n0s.at[k].set(n0)
            n1s = n1s.at[k].set(n1)
            deltas = deltas.at[k].set(delta)
            s = replace_child(s, around, n0, n1)
            s = replace_child(s, s.parent[clipM(around)], n1, n0)
            s = update_for_nni(s, around, jnp.bool_(True))
            pm = s.parent[clipM(node_move)]
            pm_root = pm == root
            q0, q1 = rsibs(s, node_move)
            na0 = jnp.where(pm_root, q0, pm)
            na1 = jnp.where(pm_root, q1, sib_of(s, node_move))
            around = jnp.where(na0 == around, na1, na0)
            return s, around, k + 1, n0s, n1s, deltas

        k_init = jnp.where(enabled, jnp.int32(0), jnp.int32(Lmax))
        s, _, k_end, n0s, n1s, deltas = jax.lax.while_loop(
            ccond, cbody, (s, around0, k_init, n0s, n1s, deltas))
        n_steps = jnp.where(enabled, k_end, 0)

        # best prefix: running sum, strict '<' keeps the FIRST minimum
        def pref(c, i):
            tot, dmin, best = c
            tot = tot + jnp.where(i < n_steps, deltas[i], 0.0)
            upd = (i < n_steps) & (tot < dmin)
            return (tot, jnp.where(upd, tot, dmin),
                    jnp.where(upd, i, best)), None

        (_, _, best), _ = jax.lax.scan(
            pref, (jnp.asarray(0.0, cd), jnp.asarray(0.0, cd),
                   jnp.int32(-1)), jnp.arange(Lmax, dtype=jnp.int32))
        return s, n0s, n1s, n_steps, best

    def unwind_tail(s, n0s, n1s, n_steps, best):
        """unwindSPRStep for steps beyond the best prefix (ref :1861-1879)."""
        def ucond(c):
            _, idx = c
            return idx > best

        def ubody(c):
            s, idx = c
            n0 = n0s[jnp.clip(idx, 0, Lmax - 1)]
            n1 = n1s[jnp.clip(idx, 0, Lmax - 1)]
            p0 = s.parent[clipM(n0)]
            p1 = s.parent[clipM(n1)]
            s = replace_child(s, p0, n0, n1)
            s = replace_child(s, p1, n1, n0)
            younger = jnp.where(s.parent[clipM(p0)] == p1, p0, p1)
            s = update_for_nni(s, younger, jnp.bool_(True))
            return s, idx - 1

        s, _ = jax.lax.while_loop(ucond, ubody, (s, n_steps - 1))
        return s

    # ------------------------------------------------- per-node processing
    par0 = s.parent[clipM(node_move)]
    pr_root0 = par0 == root
    rr0, rr1 = rsibs(s, node_move)
    around_a = jnp.where(pr_root0, rr0, par0)
    around_b = jnp.where(pr_root0, rr1, sib_of(s, node_move))
    active_node = (node_move != root) & (s.parent[clipM(node_move)] >= 0)

    if lanes4:
        # All 4 (around, ac_first) chains run vmapped from the SAME initial
        # state and the FIRST accepted lane (combo order) is kept -- 4x less
        # sequential depth per node.  NOT bit-identical to the serial order:
        # a fully-unwound chain restores topology and profile rows exactly,
        # but up-profile memo entries FILLED MID-CHAIN (from temporarily
        # modified profiles) survive the serial unwind, while the snapshot
        # restore discards them -- the same deliberate-staleness class as
        # the reference's own threads>1 modes, so this lane mode is tied to
        # the batched (threads>1) tier; serial-tier runs use lanes4=False
        # (tests/test_spr_epoch.py pins both: bit-identity for the serial
        # mode, equal quality for lanes).
        def lane(around0, acf):
            ls = s._replace(ctr=jnp.zeros((8, 2), jnp.uint32))
            ls, n0s, n1s, n_steps, best = chain_forward(
                ls, around0, acf, active_node)
            return (ls.parent, ls.child, ls.uvalid, ls.ov_ids, ls.ov_c,
                    ls.ov_w, ls.ov_u, ls.ov_n, ls.ov_flow, ls.con_on,
                    ls.con_off, ls.ctr, n0s, n1s, n_steps, best)

        arounds = jnp.stack([around_a, around_a, around_b, around_b])
        acfs = jnp.asarray([False, True, False, True])
        (par_l, child_l, uval_l, ovi_l, ovc_l, ovw_l, ovu_l, ovn_l, ovf_l,
         con1_l, con2_l, ctr_l, n0s_l, n1s_l, nst_l, best_l) = \
            jax.vmap(lane)(arounds, acfs)
        acc = best_l >= 0
        w = jnp.argmax(acc).astype(jnp.int32)     # first accepted lane
        changed = jnp.any(acc) & active_node
        sel = jnp.where(changed, w, 0)

        def pick(x_l, orig):
            return jnp.where(changed, x_l[sel], orig)

        # serial ran lanes 0..w (acceptance breaks), else all 4
        ran = jnp.where(changed, w + 1, jnp.where(active_node, 4, 0))
        lane_mask = (jnp.arange(4) < ran).astype(jnp.uint32)
        ctr = s.ctr
        dlo = (ctr_l[:, :, 0] * lane_mask[:, None]).sum(axis=0)
        for slot in range(8):
            ctr = _ctr_add(ctr, slot, dlo[slot])
        s = s._replace(
            parent=pick(par_l, s.parent), child=pick(child_l, s.child),
            uvalid=pick(uval_l, s.uvalid), ov_ids=pick(ovi_l, s.ov_ids),
            ov_c=pick(ovc_l, s.ov_c), ov_w=pick(ovw_l, s.ov_w),
            ov_u=pick(ovu_l, s.ov_u),
            ov_n=jnp.where(changed, ovn_l[sel], s.ov_n),
            ov_flow=s.ov_flow | (ovf_l & (jnp.arange(4) < ran)).any(),
            con_on=pick(con1_l, s.con_on), con_off=pick(con2_l, s.con_off),
            ctr=ctr)
        n0s_w = n0s_l[sel]
        n1s_w = n1s_l[sel]
        nst_w = jnp.where(changed, nst_l[sel], 0)
        best_w = jnp.where(changed, best_l[sel], jnp.int32(-1))
        s = unwind_tail(s, n0s_w, n1s_w, nst_w, best_w)
    else:
        def combo(i, c):
            s, changed = c
            around0 = jnp.where(i // 2 == 0, around_a, around_b)
            ac_first = (i % 2) == 1
            s, n0s, n1s, n_steps, best = chain_forward(
                s, around0, ac_first, active_node & ~changed)
            s = unwind_tail(s, n0s, n1s, n_steps, best)
            return s, changed | (best >= 0)

        s, changed = jax.lax.fori_loop(0, 4, combo, (s, jnp.bool_(False)))
        changed = changed & active_node
    s = s._replace(ctr=_ctr_add(s.ctr, K_SPR, jnp.where(changed, 1, 0)),
                   uvalid=jnp.where(changed,
                                    jnp.zeros_like(s.uvalid), s.uvalid))

    # post-accept: recompute ancestor profiles to the root (ref tcc:6291-6303)
    def acond(c):
        _, anc = c
        return anc >= 0

    def abody(c):
        s, anc = c
        s = recompute_profile(s, anc, jnp.bool_(True))
        return s, s.parent[clipM(anc)]

    anc0 = jnp.where(changed, s.parent[clipM(node_move)], jnp.int32(-1))
    s, _ = jax.lax.while_loop(acond, abody, (s, anc0))
    return s, codes_m, W_m, U_m


# Donated and undonated compilations of the per-node dispatch.  Donation
# forces the Python pjit path (~4.2 ms/call extra host overhead); below
# ~256 MB of store the out-of-place device copies are far cheaper, so the
# host wrapper picks the variant by store size (donation stays for big
# stores where doubling HBM transiently would break the fit).
_spr_node_don = functools.partial(
    jax.jit, static_argnames=_SPR_STATICS,
    donate_argnums=(0, 1, 2, 3))(_spr_node_impl)
_spr_node_nodon = functools.partial(
    jax.jit, static_argnames=_SPR_STATICS)(_spr_node_impl)


@functools.partial(jax.jit, static_argnames=("n_seqs", "two_tier"),
                   donate_argnums=(0, 1, 2))
def _spr_flush(codes_m, W_m, U_m, ov_ids, ov_c, ov_w, ov_u, ov_n,
               n_seqs, two_tier):
    return _merge_ov(codes_m, W_m, U_m, ov_ids, ov_c, ov_w, ov_u, ov_n,
                     n_seqs, two_tier)


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------


def spr_epoch_supported(nj) -> bool:
    return not nj.options.slow


def _use_spr_epoch() -> bool:
    import os
    v = os.environ.get("VFT_SPR_EPOCH")
    if v is not None:
        return v != "0"
    return jax.default_backend() != "cpu"


def run_spr_epoch(nj, i_round: int, n_rounds: int) -> None:
    """One SPR round, serial node order, fully device-resident.

    Bit-exact against engine/spr.run_spr on CPU float64 (the serial order is
    the tier-1 deterministic contract; see docs/PARITY.md)."""
    opts = nj.options
    tree = nj.tree
    prof = nj.prof
    if nj.n_seqs <= 3 or opts.max_spr_length < 1:
        return
    M = nj.maxnodes
    up = _accum_dtype()
    cd = np.float64 if up is not None else prof.dtype
    store_dt = prof.W.dtype

    node_list = [n for n in tree.postorder_nodes() if n != tree.root]
    depth = len(tree.level_lists())
    # per-node distinct-row bound: ~2*depth up+node rows + chain/unwind
    # repairs.  V is sized for one node's writes; merging every node keeps
    # the override buffer (and the while-carry it rides in) small, which
    # measures faster than a large buffer merged rarely.  Env overrides for
    # experiments: VFT_SPR_V, VFT_SPR_KMERGE.
    import os as _os
    per_node = 2 * depth + 16 * opts.max_spr_length + 64
    V = int(_os.environ.get("VFT_SPR_V", 0)) or \
        (1 << int(np.ceil(np.log2(max(512, per_node)))))
    V = min(V, 2 * M)
    k_merge = int(_os.environ.get("VFT_SPR_KMERGE", "1"))
    # 4-lane vmapped chains measured SLOWER than the sequential order on the
    # live chip (17.5 vs 11.2 s/round at N=2000): vmapping the chain
    # while_loop gives every iteration a full-carry lane-mask select over
    # the [4, V, P*C] override copies, which outweighs the 4x depth saving.
    # Kept as an env opt-in (it is also the batched quality tier, not
    # bit-serial); default off.
    lanes4 = _os.environ.get("VFT_SPR_LANES4") == "1"
    P = prof.W.shape[1]
    C = prof.U.shape[2]

    s = SprEpochState(
        ov_ids=jnp.full((V,), -1, jnp.int32),
        ov_c=jnp.zeros((V, P), dtype=prof.codes.dtype),
        ov_w=jnp.zeros((V, P), dtype=store_dt),
        ov_u=jnp.zeros((V, P * C), dtype=store_dt),
        ov_n=jnp.int32(0),
        ov_flow=jnp.bool_(False),
        parent=jnp.asarray(tree.parent, dtype=jnp.int32),
        child=jnp.asarray(tree.children, dtype=jnp.int32),
        nch=jnp.asarray(tree.n_child, dtype=jnp.int32),
        uvalid=jnp.zeros((M,), dtype=bool),
        con_on=jnp.asarray(nj.con_on if nj.n_cons else
                           np.zeros((M, 0)), dtype=jnp.int32),
        con_off=jnp.asarray(nj.con_off if nj.n_cons else
                            np.zeros((M, 0)), dtype=jnp.int32),
        ctr=jnp.zeros((8, 2), dtype=jnp.uint32),
    )

    u3 = prof.U.shape
    codes_m, W_m = prof.codes, prof.W
    U_m = prof.U.reshape(u3[0], -1)
    root_dev = jnp.int32(tree.root)
    jc = bool(opts.n_codes == 4 and not opts.use_matrix)

    store_bytes = prof.U.size * prof.U.dtype.itemsize
    _spr_node = _spr_node_don if store_bytes > 256 * 2**20 else _spr_node_nodon
    for idx, node in enumerate(node_list):
        if nj.progress is not None and idx % 100 == 0 and idx > 0:
            nj.progress.print("SPR round %3d of %3d, %d of %d nodes",
                              i_round + 1, n_rounds, idx + 1, len(node_list))
        s, codes_m, W_m, U_m = _spr_node(
            s, codes_m, W_m, U_m, np.int32(node), root_dev,
            prof.code_freq, prof.eigenval, prof.eigentot,
            n_seqs=prof.n_seqs, maxnodes=M, use_matrix=prof.use_matrix,
            two_tier=prof.two_tier, tol=prof.tol, bionj=bool(opts.bionj),
            logdist=bool(opts.logdist), jc=jc,
            pseudo=float(opts.pseudo_weight),
            max_spr_len=int(opts.max_spr_length),
            n_cons=int(nj.n_cons), con_weight=float(opts.constraint_weight),
            up=up, do_merge=(idx % k_merge == 0), lanes4=lanes4)

    codes_m, W_m, U_m = _spr_flush(
        codes_m, W_m, U_m, s.ov_ids, s.ov_c, s.ov_w, s.ov_u, s.ov_n,
        n_seqs=prof.n_seqs, two_tier=prof.two_tier)

    prof.codes, prof.W = codes_m, W_m
    prof.U = U_m.reshape(u3)

    # the round's only blocking fetches: the tree + counters
    if bool(fetch_np(s.ov_flow)):
        raise RuntimeError(
            "SPR epoch override buffer overflow (V=%d, depth at round "
            "start %d); the tree deepened beyond the sizing margin -- "
            "rerun with VFT_SPR_EPOCH=0" % (V, depth))
    tree.parent[:] = fetch_np(s.parent, np.int64)
    tree.children[:] = fetch_np(s.child, np.int64)
    tree.n_child[:] = fetch_np(s.nch, np.int32)
    if nj.n_cons:
        nj.con_on = fetch_np(s.con_on, np.int64)
        nj.con_off = fetch_np(s.con_off, np.int64)
    c = fetch_np(s.ctr, np.uint64)
    ctr = c[:, 0] + (c[:, 1] << np.uint64(32))
    nj.debug.profile_ops += int(ctr[K_PROF])
    nj.debug.profile_avg_ops += int(ctr[K_AVG])
    nj.debug.n_spr += int(ctr[K_SPR])
