"""Fused per-join device step: ONE dispatch + ONE fetch per NJ join.

Round-1 ran ~8 blocking device calls per join (out-distance refresh, pair
criterion, profile average, self-distance, BIONJ moments, out-profile update,
top-hits merge evaluation), each paying the full host<->device round-trip.
This module collapses the whole post-search join iteration of the reference's
fastNJ loop (ref NeighbourJoining.tcc:2857-3105) into a single jitted call:

    refresh out-distances of (i, j) vs the out-profile    (tcc:1012-1083)
    pair distance + criterion of the chosen join          (tcc:1115-1124)
    branch lengths from the out-distance difference       (tcc:2914-2916)
    BIONJ variance weighting                              (tcc:2918-3007)
    weighted profile average into the new node            (tcc:2055-2135)
    self-distance of the new profile
    incremental out-profile update                        (tcc:943-1010)
    new node's out-distance vs the updated out-profile
    the top-hits merge candidates' pair distances and
    out-profile distances (uniqueBestHits, tcc:4786-4833)

All outputs are packed into one flat vector so the host pays exactly one
blocking fetch; the profile store and out-profile are donated and updated
in place on device.  Host bookkeeping (tree arrays, diameters, top-hit
lists, visible sets) is applied from the fetched scalars with the exact
formulas of engine/nj.py, preserving bit-parity with the unfused path on
the CPU float64-accumulation test configuration.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import kernels
from .profiles import _accum_dtype, _pad_pow2, _rows_cwu

# output scalar layout of the packed result vector
_SCALARS = ("dist", "weight", "criterion", "out_i", "out_j", "bl_i", "bl_j",
            "bw", "diam_new", "vard_new", "selfdist_new", "selfweight_new",
            "dout_new", "wout_new")
N_SCAL_OUT = len(_SCALARS)

# input scalar layout
_IN = ("n_active", "stored_out_i", "stored_out_j", "refresh_i", "refresh_j",
       "selfdist_i", "selfweight_i", "selfdist_j", "selfweight_j",
       "diam_i", "diam_j", "vard_i", "vard_j", "totdiam", "pen_ij")
N_SCAL_IN = len(_IN)


@functools.partial(
    jax.jit,
    static_argnames=("n_seqs", "use_matrix", "two_tier", "tol", "bionj",
                     "has_cand", "has_pref", "up"),
    donate_argnums=(0, 1, 2, 3, 4))
def _fused_join(codes, W, U, w_out, f_out, idx, cand, pref, scal,
                n_seqs, code_freq, eigenval, eigentot,
                use_matrix, two_tier, tol, bionj, has_cand, has_pref,
                up=None):
    i, j, newnode, phys_new = idx[0], idx[1], idx[2], idx[3]
    s = {name: scal[k] for k, name in enumerate(_IN)}
    cd = up if up is not None else W.dtype

    def f(x):
        return x.astype(up) if up is not None else x

    ev = eigenval if use_matrix else None
    ev_up = f(ev) if ev is not None else None
    n_active = s["n_active"]

    pair = jnp.stack([i, j])
    cg, wg, ug = _rows_cwu(codes, W, U, pair, code_freq, n_seqs, two_tier)

    # pair distance of the chosen join (ref profileDist tcc:1167-1190)
    d_p, w_p = kernels.me_dist_rows(f(ug[0:1]), f(wg[0:1]),
                                    f(ug[1:2]), f(wg[1:2]), ev_up)
    weight_ij = jnp.where(w_p[0] > 0, w_p[0], 0.01)
    dist_ij = d_p[0] - (s["diam_i"] + s["diam_j"]) + s["pen_ij"]

    # out-profile distances of i, j vs the OLD out-profile
    uq_out = f(w_out[:, None] * f_out)
    wq_out = f(w_out)
    douts, wouts = kernels.me_dist_many(f(ug), f(wg), uq_out, wq_out, ev_up)

    fresh_i = kernels.out_distance_from_hit(
        douts[0], wouts[0], s["selfdist_i"], s["selfweight_i"], s["diam_i"],
        s["totdiam"], n_active)
    fresh_j = kernels.out_distance_from_hit(
        douts[1], wouts[1], s["selfdist_j"], s["selfweight_j"], s["diam_j"],
        s["totdiam"], n_active)
    out_i = jnp.where(s["refresh_i"] > 0, fresh_i, s["stored_out_i"])
    out_j = jnp.where(s["refresh_j"] > 0, fresh_j, s["stored_out_j"])

    crit = dist_ij - (out_i + out_j) / (n_active - 2.0)
    delta = (out_i - out_j) / (n_active - 2.0)
    bl_i = (dist_ij + delta) / 2.0
    bl_j = (dist_ij - delta) / 2.0

    raw_ij = dist_ij + s["diam_i"] + s["diam_j"]
    var_ij = raw_ij - s["vard_i"] - s["vard_j"]
    if bionj:
        # BIONJ weighting, Gascuel 1997 eq. 9 (ref tcc:2918-2992)
        var_i_weight = n_active * wouts[0] - s["selfweight_i"] - weight_ij
        var_j_weight = n_active * wouts[1] - s["selfweight_j"] - weight_ij
        var_i_top = (douts[0] * wouts[0] * n_active
                     - s["selfdist_i"] * s["selfweight_i"] - raw_ij * weight_ij)
        var_j_top = (douts[1] * wouts[1] * n_active
                     - s["selfdist_j"] * s["selfweight_j"] - raw_ij * weight_ij)
        ok = (var_j_weight > 0.01) & (var_i_weight > 0.01)
        d_pv_out = (n_active - 2.0) * (
            var_j_top / jnp.where(ok, var_j_weight, 1.0)
            - var_i_top / jnp.where(ok, var_i_weight, 1.0))
        d_var_diam = (n_active - 2.0) * (s["vard_i"] - s["vard_j"])
        outer = (weight_ij > 0.01) & (var_ij > 0.001)
        inner = 0.5 + (d_pv_out + d_var_diam) / (
            2.0 * (n_active - 2.0) * jnp.where(outer, var_ij, 1.0))
        inner = jnp.where(ok, inner, 0.5)
        inner = jnp.clip(inner, 0.0, 1.0)
        bw = jnp.where(outer, inner, jnp.asarray(0.5, dtype=cd))
    else:
        bw = jnp.asarray(0.5, dtype=cd)

    diam_new = bw * (bl_i + s["diam_i"]) + (1.0 - bw) * (bl_j + s["diam_j"])
    vard_new = (bw * s["vard_i"] + (1.0 - bw) * s["vard_j"]
                + bw * (1.0 - bw) * var_ij)

    # weighted profile average into the new node (store dtype, like the
    # unfused _join_update)
    bw_store = bw.astype(W.dtype)
    c_new, w_new, u_new, _ = kernels.average_profile(
        cg[0], wg[0], ug[0], cg[1], wg[1], ug[1], bw_store, code_freq,
        eigentot if use_matrix else None, tol)
    codes = codes.at[newnode].set(c_new)
    W = W.at[phys_new].set(w_new)
    U = U.at[phys_new].set(u_new)

    # self-distance of the new profile (double accumulation on CPU)
    d_self, w_self = kernels.me_dist_rows(
        f(u_new[None]), f(w_new[None]), f(u_new[None]), f(w_new[None]), ev_up)

    # incremental out-profile update (ref updateOutProfile tcc:943-1010)
    w_out2, f_out2 = kernels.update_out_profile(
        w_out, f_out, ug[0], wg[0], ug[1], wg[1], u_new, w_new,
        n_active.astype(W.dtype), code_freq,
        eigentot if use_matrix else None, tol)

    # new node's raw distance vs the UPDATED out-profile
    uq2 = f(w_out2[:, None] * f_out2)
    wq2 = f(w_out2)
    d_n, w_n = kernels.me_dist_many(f(u_new[None]), f(w_new[None]),
                                    uq2, wq2, ev_up)

    out_scal = jnp.stack([
        dist_ij.astype(cd), weight_ij.astype(cd), crit.astype(cd),
        out_i.astype(cd), out_j.astype(cd), bl_i.astype(cd), bl_j.astype(cd),
        bw.astype(cd), diam_new.astype(cd), vard_new.astype(cd),
        d_self[0].astype(cd), w_self[0].astype(cd),
        d_n[0].astype(cd), w_n[0].astype(cd)])

    parts = [out_scal]
    if has_cand:
        # merged top-hits candidates: pair dists vs the new profile and raw
        # distances vs the UPDATED out-profile (uniqueBestHits, tcc:4786-4833)
        ccg, cwg, cug = _rows_cwu(codes, W, U, cand, code_freq, n_seqs,
                                  two_tier)
        d_c, w_c = kernels.me_dist_rows(
            f(jnp.broadcast_to(u_new, cug.shape)),
            f(jnp.broadcast_to(w_new, cwg.shape)), f(cug), f(cwg), ev_up)
        do_c, wo_c = kernels.me_dist_many(f(cug), f(cwg), uq2, wq2, ev_up)
        parts += [d_c.astype(cd), w_c.astype(cd), do_c.astype(cd),
                  wo_c.astype(cd)]
    if has_pref:
        # prefetch: raw distances of the visible-set / top-visible working set
        # vs the UPDATED out-profile, so the next search's staleness refreshes
        # are host math from nj._out_raw instead of blocking dispatches
        _, pwg, pug = _rows_cwu(codes, W, U, pref, code_freq, n_seqs, two_tier)
        do_p, wo_p = kernels.me_dist_many(f(pug), f(pwg), uq2, wq2, ev_up)
        parts += [do_p.astype(cd), wo_p.astype(cd)]
    out_vec = jnp.concatenate(parts) if len(parts) > 1 else out_scal

    return codes, W, U, w_out2, f_out2, out_vec


def join_step(nj, join, n_active: int, newnode: int, cand_js=None,
              prefetch=None):
    """Execute the fused join on device and apply all host bookkeeping.

    `cand_js` (or None) is the deduped, ancestor-remapped top-hits merge
    candidate list.  `prefetch` (or None) is a set of additional rows whose
    raw out-profile distances are scanned in the same dispatch and cached
    (nj.cache_out_raw) for host-only refreshes until the next out-profile
    change.  Returns a dict with the join scalars plus, when candidates were
    given, (cand_dist_raw, cand_weight, cand_dout, cand_wout) arrays ordered
    like cand_js.
    """
    prof = nj.prof
    opts = nj.options
    i, j = join.i, join.j
    up = _accum_dtype()
    cd = np.float64 if up is not None else prof.dtype

    pen = 0.0
    if nj.n_cons:
        pen = opts.constraint_weight * nj.join_constraint_penalty(i, j)

    scal = np.array([
        n_active,
        nj.out_distances[i], nj.out_distances[j],
        1.0 if nj.n_out_dist_active[i] != n_active else 0.0,
        1.0 if nj.n_out_dist_active[j] != n_active else 0.0,
        nj.selfdist[i], nj.selfweight[i], nj.selfdist[j], nj.selfweight[j],
        nj.diameter[i], nj.diameter[j],
        nj.var_diameter[i], nj.var_diameter[j],
        nj.totdiam, pen], dtype=cd)
    idx = np.array([i, j, newnode, prof._phys(newnode)], dtype=np.int64)

    has_cand = cand_js is not None and len(cand_js) > 0
    if has_cand:
        cpad, n_c = _pad_pow2(np.asarray(cand_js, dtype=np.int64))
    else:
        cpad, n_c = np.zeros(1, dtype=np.int64), 0
    has_pref = prefetch is not None and len(prefetch) > 0
    if has_pref:
        ppad, n_p = _pad_pow2(np.asarray(prefetch, dtype=np.int64))
    else:
        ppad, n_p = np.zeros(1, dtype=np.int64), 0

    prof.codes, prof.W, prof.U, prof.w_out, prof.f_out, out_vec = _fused_join(
        prof.codes, prof.W, prof.U, prof.w_out, prof.f_out,
        jnp.asarray(idx), jnp.asarray(cpad), jnp.asarray(ppad),
        jnp.asarray(scal),
        prof.n_seqs, prof.code_freq, prof.eigenval, prof.eigentot,
        prof.use_matrix, prof.two_tier, prof.tol, bool(opts.bionj),
        has_cand, has_pref, up)
    prof.out_version += 1  # w_out/f_out replaced in the fused call

    out = np.asarray(out_vec, dtype=np.float64)  # the ONE blocking fetch
    res = {name: float(out[k]) for k, name in enumerate(_SCALARS)}
    base = N_SCAL_OUT
    if has_cand:
        K = len(cpad)
        res["cand_dist_raw"] = out[base: base + n_c]
        res["cand_weight"] = out[base + K: base + K + n_c]
        res["cand_dout"] = out[base + 2 * K: base + 2 * K + n_c]
        res["cand_wout"] = out[base + 3 * K: base + 3 * K + n_c]
        base += 4 * K
    if has_pref:
        Kp = len(ppad)
        nj.cache_out_raw(np.asarray(prefetch, dtype=np.int64)[:n_p],
                         out[base: base + n_p],
                         out[base + Kp: base + Kp + n_p])
    if has_cand:
        # candidate raw out-profile scans double as cache entries
        nj.cache_out_raw(np.asarray(cand_js, dtype=np.int64),
                         res["cand_dout"], res["cand_wout"])

    # ---- host bookkeeping (identical to the unfused fast_nj body) ----------
    tree = nj.tree
    nj.out_distances[i] = res["out_i"]
    nj.out_distances[j] = res["out_j"]
    nj.n_out_dist_active[i] = n_active
    nj.n_out_dist_active[j] = n_active
    tree.branchlength[i] = res["bl_i"]
    tree.branchlength[j] = res["bl_j"]
    nj.diameter[newnode] = res["diam_new"]
    nj.var_diameter[newnode] = res["vard_new"]
    nj.selfdist[newnode] = res["selfdist_new"]
    nj.selfweight[newnode] = res["selfweight_new"]
    nj.totdiam += res["diam_new"] - nj.diameter[i] - nj.diameter[j]
    if nj.n_cons:
        nj.con_on[newnode] = nj.con_on[i] + nj.con_on[j]
        nj.con_off[newnode] = nj.con_off[i] + nj.con_off[j]
        nj.con_out_on += nj.con_on[newnode] - nj.con_on[i] - nj.con_on[j]
        nj.con_out_off += nj.con_off[newnode] - nj.con_off[i] - nj.con_off[j]
    nj.debug.profile_avg_ops += 1
    # counter parity with the unfused path: setOutDistance refreshes + the
    # chosen pair's distance + BIONJ moment scans (only when the branch runs)
    nj.debug.outprofile_ops += int(scal[3]) + int(scal[4]) + 1  # +1: newnode
    if i < nj.n_seqs and j < nj.n_seqs:
        nj.debug.seq_ops += 1
    else:
        nj.debug.profile_ops += 1
    raw_ij = res["dist"] + nj.diameter[i] + nj.diameter[j]
    var_ij = raw_ij - nj.var_diameter[i] - nj.var_diameter[j]
    if opts.bionj and res["weight"] > 0.01 and var_ij > 0.001:
        nj.debug.outprofile_ops += 2

    # new node's out-distance at the next n_active (ref: forced refresh in the
    # first criterion evaluation that touches it)
    nj.apply_out_refresh(np.array([newnode]), np.array([res["dout_new"]]),
                         np.array([res["wout_new"]]), n_active - 1)
    nj.cache_out_raw([newnode], [res["dout_new"]], [res["wout_new"]])
    return res
