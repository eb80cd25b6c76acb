"""Sharded (multi-chip) versions of the hot kernels via shard_map + collectives.

Maps the reference's implied communication patterns (SURVEY.md section 5.8)
onto XLA collectives:
* profile distance / log-likelihood position sums  -> local partial + psum('sp')
* one-vs-many candidate scans                       -> rows sharded on 'dp',
  partial argmin per shard, global argmin via allgather/min with lowest-index
  tie-break (deterministic join order)
* out-profile accumulation (vector_add under omp critical in the reference,
  tcc:780-783)                                      -> psum over 'dp'
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def dist_scan_sharded(mesh: Mesh, use_matrix: bool):
    """Build a jitted sharded one-vs-all scan + argmin-criterion step.

    Inputs: U [M, Ppad, C] sharded (dp, sp, None); W [M, Ppad] (dp, sp);
    query uq [Ppad, C] (sp, None), wq [Ppad] (sp,); out_dists [M] (dp,);
    n_active scalar.  Returns (best_index, best_criterion, dist[M], denom[M]).
    """

    def local(U, W, uq, wq, out_dists, n_active):
        M = U.shape[0]
        denom = W @ wq
        dots = U.reshape(M, -1) @ uq.reshape(-1)
        denom = jax.lax.psum(denom, "sp")
        dots = jax.lax.psum(dots, "sp")
        if use_matrix:
            top = dots
        else:
            top = denom - dots
        dist = jnp.where(denom > 0, top / jnp.where(denom > 0, denom, 1.0), 1.0)
        crit = dist - out_dists / (n_active - 2.0)
        # local argmin then global argmin with lowest-index tie-break
        k = jnp.argmin(crit)
        local_best = crit[k]
        dp_idx = jax.lax.axis_index("dp")
        global_idx = k + dp_idx * M
        all_best = jax.lax.all_gather(local_best, "dp")
        all_idx = jax.lax.all_gather(global_idx, "dp")
        order = jnp.lexsort((all_idx, all_best))
        best = all_idx[order[0]]
        best_crit = all_best[order[0]]
        return best, best_crit, dist, denom

    f = shard_map(local, mesh=mesh,
                  in_specs=(P("dp", "sp", None), P("dp", "sp"), P("sp", None),
                            P("sp"), P("dp"), P()),
                  out_specs=(P(), P(), P("dp"), P("dp")),
                  check_rep=False)
    return jax.jit(f)


def pair_loglk_sharded(mesh: Mesh):
    """Sharded Jukes-Cantor pair log-likelihood over the position axis."""

    def local(f1, f2, w1, w2, psame, pdiff, ratecat, pos_mask):
        ps = psame[ratecat]
        pd = pdiff[ratecat]
        dot = jnp.einsum("pc,pc->p", f1, f2)
        sum2 = f2.sum(axis=-1)
        lk = pd * sum2 + (ps - pd) * dot
        lk = jnp.where(pos_mask, lk, 1.0)
        return jax.lax.psum(jnp.sum(jnp.log(jnp.maximum(lk, 1e-37))), "sp")

    f = shard_map(local, mesh=mesh,
                  in_specs=(P("sp", None), P("sp", None), P("sp"), P("sp"),
                            P(), P(), P("sp"), P("sp")),
                  out_specs=P(),
                  check_rep=False)
    return jax.jit(f)


def posterior_jc_sharded(mesh: Mesh):
    """Sharded JC posterior profile -- embarrassingly parallel per position."""

    def local(f1, f2, w1, w2, ps1, pd1, ps2, pd2, ratecat):
        from ..ops.kernels import posterior_jc
        return posterior_jc(f1, f2, w1, w2, ps1, pd1, ps2, pd2, ratecat)

    f = shard_map(local, mesh=mesh,
                  in_specs=(P("sp", None), P("sp", None), P("sp"), P("sp"),
                            P(), P(), P(), P(), P("sp")),
                  out_specs=(P("sp"), P("sp", None)),
                  check_rep=False)
    return jax.jit(f)


def out_profile_sharded(mesh: Mesh):
    """Sharded out-profile accumulation: rows on dp, positions on sp;
    the cross-row sum is a psum over 'dp' (ref outProfile's critical-section
    vector_add, tcc:780-783)."""

    def local(U, W, mask):
        m = mask.astype(U.dtype)
        n = jax.lax.psum(m.sum(), "dp")
        w_out = jax.lax.psum(jnp.einsum("m,mp->p", m, W), "dp") / jnp.maximum(n, 1)
        accum = jax.lax.psum(jnp.einsum("m,mpc->pc", m, U), "dp")
        w_out = jnp.maximum(w_out, 1e-20)
        total = accum.sum(axis=-1)
        ok = total > 1e-10
        f_out = accum / jnp.where(ok, total, 1.0)[..., None]
        return w_out, f_out

    f = shard_map(local, mesh=mesh,
                  in_specs=(P("dp", "sp", None), P("dp", "sp"), P("dp")),
                  out_specs=(P("sp"), P("sp", None)),
                  check_rep=False)
    return jax.jit(f)


def training_step(mesh: Mesh, use_matrix: bool = False):
    """One full sharded NJ 'training step' used by the multi-chip dry run:
    best-join scan + join profile average + out-profile update + tree
    log-likelihood partials, all under one jit over the mesh."""

    scan = dist_scan_sharded(mesh, use_matrix)

    def step(U, W, uq, wq, out_dists, n_active, psame, pdiff, ratecat, pos_mask):
        best, best_crit, dist, denom = scan(U, W, uq, wq, out_dists, n_active)

        def inner(U, W, uq, wq, pos_mask, psame, pdiff, ratecat):
            # join: average the query with the best row (balanced), then a JC
            # pair log-likelihood of the merged profile vs the query
            u_new = 0.5 * (U[0] + uq)
            w_new = 0.5 * (W[0] + wq)
            dot = jnp.einsum("pc,pc->p", u_new, uq)
            lk = pdiff[ratecat] + (psame[ratecat] - pdiff[ratecat]) * dot
            lk = jnp.where(pos_mask, jnp.maximum(lk, 1e-6), 1.0)
            ll = jax.lax.psum(jnp.sum(jnp.log(lk)), "sp")
            return u_new, w_new, ll

        f = shard_map(inner, mesh=mesh,
                      in_specs=(P("dp", "sp", None), P("dp", "sp"), P("sp", None),
                                P("sp"), P("sp"), P(), P(), P("sp")),
                      out_specs=(P("sp", None), P("sp"), P()),
                      check_rep=False)
        u_new, w_new, ll = f(U, W, uq, wq, pos_mask, psame, pdiff, ratecat)
        return best, best_crit, u_new, w_new, ll

    return jax.jit(step)
