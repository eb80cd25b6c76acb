"""Pallas TPU kernels for the hot inner loops.

The dominant compute of the NJ phase is the one-vs-many profile-distance scan
(ref setBestHit NeighbourJoining.tcc:3571-3646).  The Pallas kernel fuses the
whole candidate evaluation into one pass over HBM:

    dots[m]  = U[m, :] . uq          (MXU matvec over the flattened P*C axis)
    denom[m] = W[m, :] . wq
    dist[m]  = piece(dots, denom)    (matrix or %different mode)
    crit[m]  = dist[m] - outd[m] / (nActive - 2)

plus a running (min, argmin) carried across grid steps in SMEM scratch -- so
candidate search reads U exactly once and never materializes intermediates in
HBM.  The criterion subtraction and argmin ride along for free on the VPU
while the MXU streams the matvec.

On non-TPU backends the wrapper falls back to the equivalent jnp expression
(same math, XLA-fused).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

TILE_M = 256


def _have_pallas_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _scan_kernel(U_ref, W_ref, uq_ref, wq_ref, outd_ref, scal_ref,
                 dist_ref, denom_ref, crit_ref, best_ref,
                 min_scratch, arg_scratch, *, use_matrix):
    """One grid step: evaluate TILE_M candidates and fold into the running min.

    scal_ref holds [n_active, M_real] in SMEM (masking the padded tail).
    """
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        min_scratch[0] = jnp.float32(1e30)
        arg_scratch[0] = jnp.int32(0)

    n_active = scal_ref[0]
    m_real = scal_ref[1]

    dots = jnp.dot(U_ref[:], uq_ref[:], preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    denom = jnp.dot(W_ref[:], wq_ref[:], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    if use_matrix:
        top = dots
    else:
        top = denom - dots
    dist = jnp.where(denom > 0, top / jnp.where(denom > 0, denom, 1.0), 1.0)
    crit = dist - outd_ref[:] / (n_active.astype(jnp.float32) - 2.0)

    rows = jax.lax.broadcasted_iota(jnp.int32, (TILE_M, 1), 0) + i * TILE_M
    valid = rows < m_real
    crit_m = jnp.where(valid, crit, 1e30)

    dist_ref[:] = dist
    denom_ref[:] = denom
    crit_ref[:] = crit_m

    tile_min = jnp.min(crit_m)
    tile_arg = jnp.argmin(crit_m).astype(jnp.int32) + i * TILE_M

    better = tile_min < min_scratch[0]
    min_scratch[0] = jnp.where(better, tile_min, min_scratch[0])
    arg_scratch[0] = jnp.where(better, tile_arg, arg_scratch[0])

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        best_ref[0] = arg_scratch[0]
        best_ref[1] = min_scratch[0].astype(jnp.float32).view(jnp.int32)


@functools.partial(jax.jit, static_argnames=("use_matrix",))
def _scan_pallas(U2, W, uq2, wq, outd, scal, use_matrix):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = U2.shape
    P = W.shape[1]
    grid = (M // TILE_M,)
    kernel = functools.partial(_scan_kernel, use_matrix=use_matrix)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE_M, K), lambda i: (i, 0)),
                pl.BlockSpec((TILE_M, P), lambda i: (i, 0)),
                pl.BlockSpec((K, 1), lambda i: (0, 0)),
                pl.BlockSpec((P, 1), lambda i: (0, 0)),
                pl.BlockSpec((TILE_M, 1), lambda i: (i, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((TILE_M, 1), lambda i: (i, 0)),
                pl.BlockSpec((TILE_M, 1), lambda i: (i, 0)),
                pl.BlockSpec((TILE_M, 1), lambda i: (i, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[
                pltpu.SMEM((1,), jnp.float32),
                pltpu.SMEM((1,), jnp.int32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
            jax.ShapeDtypeStruct((2,), jnp.int32),
        ],
    )(U2, W, uq2, wq, outd.reshape(-1, 1), scal)


def nj_scan(U, W, uq, wq, outd, n_active, eigenval=None):
    """Fused one-vs-all scan + criterion + argmin.

    U: [M, P, C] weighted profiles; W: [M, P]; uq/wq: query; outd: [M] scaled
    out-distances; eigenval: [C] or None (matrix vs %different mode).
    Returns (best_idx, best_crit, dist[M], denom[M], crit[M]).
    """
    M, P, C = U.shape
    use_matrix = eigenval is not None
    a = (uq * eigenval[None, :]) if use_matrix else uq
    if _have_pallas_tpu() and M % TILE_M == 0 and (P * C) % 128 == 0 and P % 128 == 0:
        U2 = U.reshape(M, P * C)
        scal = jnp.asarray([n_active, M], dtype=jnp.int32)
        dist, denom, crit, best = _scan_pallas(
            U2.astype(jnp.float32), W.astype(jnp.float32),
            a.reshape(-1, 1).astype(jnp.float32),
            wq.reshape(-1, 1).astype(jnp.float32),
            outd.astype(jnp.float32), scal, use_matrix)
        best_idx = best[0]
        best_crit = best[1].view(jnp.float32)
        return best_idx, best_crit, dist[:, 0], denom[:, 0], crit[:, 0]
    # jnp fallback (identical math)
    dots = U.reshape(M, -1) @ a.reshape(-1)
    denom = W @ wq
    top = dots if use_matrix else denom - dots
    dist = jnp.where(denom > 0, top / jnp.where(denom > 0, denom, 1.0), 1.0)
    crit = dist - outd / (jnp.float32(n_active) - 2.0)
    best_idx = jnp.argmin(crit)
    return best_idx, crit[best_idx], dist, denom, crit


# ---------------------------------------------------------------------------
# Two-tier leaf scan: distances of one query against code-only leaves, reading
# 1 byte/position from HBM (the N>=20k regime; ref seqDist leaf fast path,
# NeighbourJoining.tcc:1601-1624).  The int8 codes expand to "rotated one-hot
# dot query" values inside the tile via C masked selects against the projected
# query table G[c, p] = (uq * eigenval) . codeFreq[c]  (or uq itself in
# %different mode) -- no leaf vectors ever exist in HBM.
# ---------------------------------------------------------------------------


def _scan_codes_kernel(codes_ref, G_ref, wq_ref, outd_ref, scal_ref,
                       dist_ref, denom_ref, crit_ref, best_ref,
                       min_scratch, arg_scratch, *, use_matrix, n_codes):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        min_scratch[0] = jnp.float32(1e30)
        arg_scratch[0] = jnp.int32(0)

    n_active = scal_ref[0]
    l_real = scal_ref[1]

    codes = codes_ref[:].astype(jnp.int32)      # [TILE_M, P]
    wl = (codes != 127).astype(jnp.float32)     # NOCODE -> weight 0
    denom = jnp.dot(wl, wq_ref[:],              # [TILE_M, 1]
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    picked = jnp.zeros(codes.shape, dtype=jnp.float32)
    for c in range(n_codes):
        # f32 mask-multiply (boolean broadcasts trip Mosaic relayouts)
        picked = picked + (codes == c).astype(jnp.float32) * G_ref[c][None, :]
    contrib = jnp.sum(picked, axis=1, keepdims=True)   # [TILE_M, 1]
    if use_matrix:
        top = contrib
    else:
        top = denom - contrib
    dist = jnp.where(denom > 0, top / jnp.where(denom > 0, denom, 1.0), 1.0)
    crit = dist - outd_ref[:] / (n_active.astype(jnp.float32) - 2.0)

    rows = jax.lax.broadcasted_iota(jnp.int32, (TILE_M, 1), 0) + i * TILE_M
    crit_m = jnp.where(rows < l_real, crit, 1e30)

    dist_ref[:] = dist
    denom_ref[:] = denom
    crit_ref[:] = crit_m

    tile_min = jnp.min(crit_m)
    tile_arg = jnp.argmin(crit_m).astype(jnp.int32) + i * TILE_M
    better = tile_min < min_scratch[0]
    min_scratch[0] = jnp.where(better, tile_min, min_scratch[0])
    arg_scratch[0] = jnp.where(better, tile_arg, arg_scratch[0])

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        best_ref[0] = arg_scratch[0]
        best_ref[1] = min_scratch[0].astype(jnp.float32).view(jnp.int32)


@functools.partial(jax.jit, static_argnames=("use_matrix", "n_codes", "n_tiles"))
def _scan_codes_pallas(codes, G, wq, outd, scal, use_matrix, n_codes, n_tiles):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P = codes.shape[1]
    C = G.shape[0]
    grid = (n_tiles,)
    M_out = n_tiles * TILE_M
    kernel = functools.partial(_scan_codes_kernel, use_matrix=use_matrix,
                               n_codes=n_codes)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE_M, P), lambda i: (i, 0)),
                pl.BlockSpec((C, P), lambda i: (0, 0)),
                pl.BlockSpec((P, 1), lambda i: (0, 0)),
                pl.BlockSpec((TILE_M, 1), lambda i: (i, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((TILE_M, 1), lambda i: (i, 0)),
                pl.BlockSpec((TILE_M, 1), lambda i: (i, 0)),
                pl.BlockSpec((TILE_M, 1), lambda i: (i, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[
                pltpu.SMEM((1,), jnp.float32),
                pltpu.SMEM((1,), jnp.int32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((M_out, 1), jnp.float32),
            jax.ShapeDtypeStruct((M_out, 1), jnp.float32),
            jax.ShapeDtypeStruct((M_out, 1), jnp.float32),
            jax.ShapeDtypeStruct((2,), jnp.int32),
        ],
    )(codes, G, wq, outd.reshape(-1, 1), scal)


def nj_scan_two_tier(codes, W_int, U_int, uq, wq, outd, n_active, n_seqs,
                     eigenval, code_freq):
    """Fused one-vs-all scan in two-tier mode: leaves stream as int8 codes
    (Pallas select kernel), internal rows as dense weighted vectors (Pallas
    matvec kernel); results concatenate in row order [leaves, internals].

    codes: [rows, P] int8 (leaf prefix used); W_int/U_int: internal float rows
    (physical index = row - n_seqs); outd: [n_seqs + M_int] scaled out-dists.
    Returns (best_idx, best_crit, dist, denom, crit) over the concat layout.
    """
    P, C = uq.shape
    M_int = U_int.shape[0]
    use_matrix = eigenval is not None
    n_tiles = (n_seqs + TILE_M - 1) // TILE_M
    ok = (_have_pallas_tpu() and P % 128 == 0 and (P * C) % 128 == 0
          and M_int % TILE_M == 0 and n_tiles * TILE_M <= codes.shape[0])
    if not ok:
        raise ValueError("nj_scan_two_tier preconditions not met")
    ev = eigenval if use_matrix else None
    return _scan_two_tier_jit(codes, W_int, U_int, uq, wq, outd,
                              jnp.int32(n_active), ev, code_freq,
                              n_seqs, n_tiles, use_matrix)


@functools.partial(jax.jit,
                   static_argnames=("n_seqs", "n_tiles", "use_matrix"))
def _scan_two_tier_jit(codes, W_int, U_int, uq, wq, outd, n_active, eigenval,
                       code_freq, n_seqs, n_tiles, use_matrix):
    P, C = uq.shape
    M_int = U_int.shape[0]
    if use_matrix:
        G = ((uq * eigenval[None, :]) @ code_freq.T).T   # [C, P]
        a = uq * eigenval[None, :]
    else:
        G = uq.T
        a = uq
    scal_l = jnp.stack([n_active, jnp.int32(n_seqs)])
    dist_l, den_l, crit_l, best_l = _scan_codes_pallas(
        codes, G.astype(jnp.float32),
        wq.reshape(-1, 1).astype(jnp.float32),
        outd[: n_tiles * TILE_M].astype(jnp.float32), scal_l,
        use_matrix, C, n_tiles)
    scal_i = jnp.stack([n_active, jnp.int32(M_int)])
    dist_i, den_i, crit_i, best_i = _scan_pallas(
        U_int.reshape(M_int, P * C).astype(jnp.float32),
        W_int.astype(jnp.float32),
        a.reshape(-1, 1).astype(jnp.float32),
        wq.reshape(-1, 1).astype(jnp.float32),
        outd[n_seqs: n_seqs + M_int].astype(jnp.float32), scal_i, use_matrix)
    dist = jnp.concatenate([dist_l[:n_seqs, 0], dist_i[:, 0]])
    denom = jnp.concatenate([den_l[:n_seqs, 0], den_i[:, 0]])
    crit = jnp.concatenate([crit_l[:n_seqs, 0], crit_i[:, 0]])
    cl = best_l[1].view(jnp.float32)
    ci = best_i[1].view(jnp.float32)
    # ties resolve to the lowest row index (leaves precede internals)
    take_leaf = cl <= ci
    best_idx = jnp.where(take_leaf, best_l[0], best_i[0] + n_seqs)
    best_crit = jnp.where(take_leaf, cl, ci)
    return best_idx, best_crit, dist, denom, crit


# NOTE: an earlier revision carried a Pallas per-site pair-log-likelihood
# kernel here (lk[p] = sum_c f1 f2 ee; loglk = sum_p log lk).  It was removed
# rather than wired in: the op is a pure elementwise-multiply + reduce that
# XLA already emits as a single HBM-pass reduce fusion (verified identical
# traffic on TPU), and the engine's call sites (ml_profiles._pair_loglk*,
# the device Brent) also need the per-site lk vector for SH resampling --
# which the scalar-only kernel could not provide.  The fused scans above are
# where Pallas earns its keep (criterion+argmin riding the matvec).
