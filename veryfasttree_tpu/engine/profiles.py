"""Device-resident profile store (minimum-evolution phase).

TPU-native replacement for the reference's per-node heap/mmap Profile objects
(ref NeighbourJoining.h:126-161, DiskMemory): profiles live in fixed-shape
device arrays

    codes   int8 [rows, P]    (NOCODE marks stored-vector / gap positions)
    W       f32  [rows, P]    (non-gap weights)
    U       f32  [rows, P, C] (weight * rotated frequency vector)

padded along P to a lane multiple.  The sparse "only store vectors for
ambiguous positions" encoding of the reference collapses into U exactly (a
coded position's implicit vector is the rotated one-hot codeFreq[c]; identity:
codeFreq[c1].(eigenval*codeFreq[c2]) == distances[c1][c2]), so every distance
scan is a dense matmul and seqDist/profileDist/codeDist become one code path.

Two storage tiers (the TPU form of the reference's leaf fast path + disk
computing, SURVEY.md section 5.7):
* dense mode (default, small/medium N): every row materialized;
* two-tier mode (large N): leaves exist only as int8 codes -- 1 byte/position
  in HBM instead of C floats -- and their weighted one-hot vectors are
  expanded on the fly inside the kernels (ops/kernels.leaf_u /
  me_dist_many_codes).  This cuts leaf HBM footprint and scan bandwidth ~16x
  and is what makes genome-scale alignments fit in pod HBM.

Row layout: [0, maxnodes) node profiles, [maxnodes, 2*maxnodes) up-profile
slots (ref getUpProfile tcc:3382-3434).  In two-tier mode the float arrays
cover only rows >= n_seqs (physical index = row - n_seqs).

Host<->device contract: the NJ loop passes numpy index arrays (padded to
power-of-two buckets so jit caches a few shapes) and receives numpy dist/denom
arrays; all heavy math stays on device.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import NOCODE
from ..ops import kernels


def fetch_np(x, dtype=None):
    """Device->host fetch that is safe under multi-process (multi-host)
    meshes: arrays spanning non-addressable devices are allgathered first
    (every process runs the identical host orchestration, so the collective
    is reached in lockstep on all hosts).  Single-process arrays take the
    plain np.asarray path."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils
        x = multihost_utils.process_allgather(x, tiled=True)
    return np.asarray(x) if dtype is None else np.asarray(x, dtype=dtype)


def _pad_pow2(idx: np.ndarray, fill: int = 0):
    n = len(idx)
    m = max(1, 1 << (n - 1).bit_length()) if n else 1
    out = np.full(m, fill, dtype=np.int64)
    out[:n] = idx
    return out, n


# The reference accumulates profile-distance sums in double even in float mode
# (ref profileDist tcc:1167-1190: `double top, denom` over float profiles), and
# near-tie join decisions at large N are sensitive to that.  On CPU (parity
# tests) we therefore upcast the contractions to f64; on TPU we stay in f32
# (f64 is emulated and the oracle is not bit-comparable there anyway).


def _accum_dtype():
    import jax as _jax
    if _jax.config.jax_enable_x64 and _jax.default_backend() == "cpu":
        return jnp.float64
    return None


# Donation forces the Python pjit path (~4.2 ms extra host overhead per
# call vs the C++ fast path); an out-of-place device copy of a small store
# costs ~0.1 ms.  Store-mutating jits therefore compile BOTH variants and
# the callers pick by store size: donate only when transiently doubling the
# store in HBM would matter.
DONATE_MIN_BYTES = 256 * 2**20


def _dual_jit(fn, statics, donate):
    """(donated, undonated) compilations of `fn`."""
    return (functools.partial(jax.jit, static_argnames=statics,
                              donate_argnums=donate)(fn),
            functools.partial(jax.jit, static_argnames=statics)(fn))


def _pick(pair, nbytes):
    return pair[0] if nbytes > DONATE_MIN_BYTES else pair[1]


def _rows_cwu(codes, W, U, rows, code_freq, n_seqs, two_tier):
    """Gather (codes, W, U) tiles for arbitrary row indices.

    In two-tier mode, leaf rows (< n_seqs) are expanded from codes on the fly;
    the float arrays hold only rows >= n_seqs at physical index row - n_seqs.
    """
    c = codes[rows]
    if not two_tier:
        return c, W[rows], U[rows]
    is_leaf = rows < n_seqs
    phys = jnp.maximum(rows - n_seqs, 0)
    w_i = W[phys]
    u_i = U[phys]
    u_l, w_l = kernels.leaf_u(c, code_freq, U.dtype)
    return (c,
            jnp.where(is_leaf[:, None], w_l, w_i),
            jnp.where(is_leaf[:, None, None], u_l, u_i))


@functools.partial(jax.jit, static_argnames=("n_seqs", "use_matrix", "two_tier", "up"))
def _dist_all(codes, W, U, uq, wq, n_seqs, eigenval, code_freq, use_matrix,
              two_tier, up=None):
    """One query vs ALL rows -> concat [dist, denom] ordered by row index
    (single packed vector = single blocking fetch over the device tunnel)."""
    ev = eigenval if use_matrix else None
    if up is not None:
        uq = uq.astype(up)
        wq = wq.astype(up)
        U = U.astype(up)
        W = W.astype(up)
        code_freq = code_freq.astype(up)
        if ev is not None:
            ev = ev.astype(up)
    if not two_tier:
        d, w = kernels.me_dist_many(U, W, uq, wq, ev)
        return jnp.concatenate([d, w])
    d_leaf, w_leaf = kernels.me_dist_many_codes(
        codes[:n_seqs], uq, wq, ev, code_freq, uq.dtype)
    d_int, w_int = kernels.me_dist_many(U, W, uq, wq, ev)
    return jnp.concatenate([d_leaf, d_int, w_leaf, w_int])


@functools.partial(jax.jit, static_argnames=("n_seqs", "use_matrix", "two_tier", "up"))
def _dist_many_vs_leaves(codes, W, U, rows, n_seqs, eigenval, code_freq,
                         use_matrix, two_tier, up=None):
    """K query rows vs ALL leaves -> (dist[K, n_seqs], denom[K, n_seqs]).

    The top-hits seed-scan kernel: one dispatch evaluates a whole wave of
    seeds (ref setAllLeafTopHits tcc:3746-4124 runs one seed per parallel
    block; here the wave is one [K, P*C] x [P*C, n_seqs] MXU matmul)."""
    _, wq, uq = _rows_cwu(codes, W, U, rows, code_freq, n_seqs, two_tier)
    ev = eigenval if use_matrix else None
    if up is not None:
        uq = uq.astype(up)
        wq = wq.astype(up)
        W = W.astype(up)
        U = U.astype(up)
        code_freq = code_freq.astype(up)
        ev = ev.astype(up) if ev is not None else None
    K = uq.shape[0]
    if two_tier:
        f = jax.vmap(lambda u, w: kernels.me_dist_many_codes(
            codes[:n_seqs], u, w, ev, code_freq, u.dtype))
        dist, denom = f(uq, wq)
        return jnp.concatenate([dist, denom])
    Wl = W[:n_seqs]
    Ul = U[:n_seqs]
    denom = wq @ Wl.T                                    # [K, n_seqs]
    if ev is not None:
        a = (uq * ev[None, None, :]).reshape(K, -1)
        top = a @ Ul.reshape(n_seqs, -1).T
    else:
        top = denom - uq.reshape(K, -1) @ Ul.reshape(n_seqs, -1).T
    dist = jnp.where(denom > 0, top / jnp.where(denom > 0, denom, 1.0), 1.0)
    return jnp.concatenate([dist, denom])


# Expanded [K, P, C] row stacks with large K get a C-minor tiled layout on
# TPU whose 4->128 lane padding is a ~32x memory blowup; gather+contract
# paths therefore lax.map over fixed-size chunks above this bound (per-row
# math unchanged -- row reductions are row-local).
_GCHUNK = 2048


def _map_chunks(body, arrays, K):
    nc = ((K + _GCHUNK - 1) // _GCHUNK) * _GCHUNK
    pad = lambda x: jnp.concatenate(
        [x, jnp.zeros((nc - K,), dtype=x.dtype)]).reshape(-1, _GCHUNK)
    out = jax.lax.map(body, tuple(pad(x) for x in arrays))
    return tuple(o.reshape(-1)[:K] for o in out)


@functools.partial(jax.jit,
                   static_argnames=("n_seqs", "use_matrix", "two_tier", "k",
                                    "up"))
def _leaf_topk(codes, W, U, rows, od, n_seqs, eigenval, code_freq,
               use_matrix, two_tier, k, up=None):
    """Wave seed scan with ON-DEVICE top-k by NJ criterion.

    The init host logic only ever reads the best 2m+2 candidates per seed
    (list save, close-neighbor tests, transfers all index sj[:2m]), but the
    full [K, n_seqs] fetch was ~50 MB/wave over the ~30 MB/s tunnel at
    N=100k.  Returns packed [K, 3k]: (idx, dist, weight) ascending by
    criterion, ties to the lowest index like the host's stable argsort.
    Valid only while every leaf out-distance is fresh at n_active == n_seqs
    and there are no constraints (the caller checks)."""
    packed = _dist_many_vs_leaves(codes, W, U, rows, n_seqs, eigenval,
                                  code_freq, use_matrix, two_tier, up)
    K = rows.shape[0]
    dist = packed[:K]
    denom = packed[K:]
    odc = od.astype(dist.dtype)
    crit = dist - (odc[rows][:, None] + odc[None, :]) / (n_seqs - 2)
    negc, idx = jax.lax.top_k(-crit, k)
    dist_k = jnp.take_along_axis(dist, idx, 1)
    w_k = jnp.take_along_axis(denom, idx, 1)
    return jnp.concatenate([idx.astype(dist.dtype), dist_k, w_k], axis=1)


@functools.partial(jax.jit, static_argnames=("n_seqs", "use_matrix", "two_tier", "up"))
def _dist_gather(codes, W, U, js, uq, wq, n_seqs, eigenval, code_freq,
                 use_matrix, two_tier, up=None):
    """Query vs gathered rows -> concat [dist, denom] (one packed fetch)."""
    ev = eigenval if use_matrix else None
    if up is not None:
        uq = uq.astype(up)
        wq = wq.astype(up)
        ev = ev.astype(up) if ev is not None else None

    def one_chunk(rows):
        if isinstance(rows, tuple):   # lax.map passes the pytree through
            rows, = rows
        _, Wj, Uj = _rows_cwu(codes, W, U, rows, code_freq, n_seqs, two_tier)
        if up is not None:
            Uj, Wj = Uj.astype(up), Wj.astype(up)
        return kernels.me_dist_many(Uj, Wj, uq, wq, ev)

    if len(js) <= _GCHUNK:
        d, w = one_chunk(js)
    else:
        d, w = _map_chunks(one_chunk, (js,), len(js))
    return jnp.concatenate([d, w])


@functools.partial(jax.jit, static_argnames=("n_seqs", "use_matrix", "two_tier", "up"))
def _dist_rows(codes, W, U, iis, jjs, n_seqs, eigenval, code_freq,
               use_matrix, two_tier, up=None):
    """Row-pair distances -> concat [dist, denom] (one packed fetch)."""
    ev = eigenval if use_matrix else None
    if up is not None:
        ev = ev.astype(up) if ev is not None else None

    def one_chunk(pair):
        ii, jj = pair
        _, W1, U1 = _rows_cwu(codes, W, U, ii, code_freq, n_seqs, two_tier)
        _, W2, U2 = _rows_cwu(codes, W, U, jj, code_freq, n_seqs, two_tier)
        if up is not None:
            U1, W1, U2, W2 = (x.astype(up) for x in (U1, W1, U2, W2))
        return kernels.me_dist_rows(U1, W1, U2, W2, ev)

    if len(iis) <= _GCHUNK:
        d, w = one_chunk((iis, jjs))
    else:
        d, w = _map_chunks(one_chunk, (iis, jjs), len(iis))
    return jnp.concatenate([d, w])


@functools.partial(jax.jit, static_argnames=("n_seqs", "use_matrix", "two_tier", "up"))
def _refresh_and_pairs(codes, W, U, w_out, f_out, rrows, iis, jjs, n_seqs,
                       eigenval, code_freq, use_matrix, two_tier, up=None):
    """One dispatch serving the two device needs of a criterion evaluation:
    raw distances of `rrows` vs the out-profile (out-distance refresh) AND
    row-pair distances (iis, jjs).  Packed as one vector so the host pays a
    single blocking fetch (ref setOutDistance tcc:1012-1083 + setDistCriterion
    tcc:1115-1124 fused)."""
    ev = eigenval if use_matrix else None

    def f(x):
        return x.astype(up) if up is not None else x

    ev_up = f(ev) if ev is not None else None
    uq = f(w_out[:, None] * f_out)
    wq = f(w_out)
    _, Wr, Ur = _rows_cwu(codes, W, U, rrows, code_freq, n_seqs, two_tier)
    d_out, w_o = kernels.me_dist_many(f(Ur), f(Wr), uq, wq, ev_up)
    _, W1, U1 = _rows_cwu(codes, W, U, iis, code_freq, n_seqs, two_tier)
    _, W2, U2 = _rows_cwu(codes, W, U, jjs, code_freq, n_seqs, two_tier)
    d_p, w_p = kernels.me_dist_rows(f(U1), f(W1), f(U2), f(W2), ev_up)
    cd = up if up is not None else W.dtype
    return jnp.concatenate([d_out.astype(cd), w_o.astype(cd),
                            d_p.astype(cd), w_p.astype(cd)])


@functools.partial(jax.jit, static_argnames=("n_seqs", "use_matrix", "two_tier"))
def _dist_pieces(codes, W, U, iis, jjs, n_seqs, eigenval, code_freq,
                 use_matrix, two_tier):
    """Per-position weighted distance pieces for row pairs -> ([K,P], [K,P])."""
    _, W1, U1 = _rows_cwu(codes, W, U, iis, code_freq, n_seqs, two_tier)
    _, W2, U2 = _rows_cwu(codes, W, U, jjs, code_freq, n_seqs, two_tier)
    weights = W1 * W2
    dots = jnp.einsum("kpc,kpc->kp", U1, U2)
    if use_matrix:
        pieces = jnp.einsum("kpc,kpc,c->kp", U1, U2, eigenval)
    else:
        pieces = weights - dots
    return pieces, weights


@functools.partial(jax.jit,
                   static_argnames=("n_seqs", "use_matrix", "two_tier", "tol"),
                   donate_argnums=(0, 1, 2))
def _join_update(codes, W, U, i, j, newnode, phys_new, bw, n_seqs, code_freq,
                 eigenval, eigentot, use_matrix, two_tier, tol):
    pair = jnp.stack([i, j])
    cg, wg, ug = _rows_cwu(codes, W, U, pair, code_freq, n_seqs, two_tier)
    c, w, u, _ = kernels.average_profile(
        cg[0], wg[0], ug[0], cg[1], wg[1], ug[1], bw, code_freq,
        eigentot if use_matrix else None, tol)
    codes = codes.at[newnode].set(c)
    W = W.at[phys_new].set(w)
    U = U.at[phys_new].set(u)
    return codes, W, U


@functools.partial(jax.jit, static_argnames=("n_seqs", "use_matrix", "two_tier", "tol"))
def _outprofile_full(codes, W, U, mask_leaf, mask_int, n_seqs, code_freq,
                     eigentot, use_matrix, two_tier, tol):
    """Out-profile over active rows.  Two-tier: leaf contributions accumulate
    from codes in chunks (never materializing leaf vectors in HBM)."""
    et = eigentot if use_matrix else None
    if not two_tier:
        full_mask = jnp.concatenate([mask_leaf, mask_int])[: U.shape[0]]
        return kernels.out_profile(U, W, full_mask, code_freq, et, tol)
    C = U.shape[-1]
    P = U.shape[1]
    n = mask_leaf.sum() + mask_int.sum()
    m_int = mask_int.astype(U.dtype)
    accum = jnp.einsum("m,mpc->pc", m_int, U)
    w_sum = jnp.einsum("m,mp->p", m_int, W)

    CHUNK = 1024
    n_chunks = (n_seqs + CHUNK - 1) // CHUNK
    pad = n_chunks * CHUNK
    codes_l = jnp.pad(codes[:n_seqs], ((0, pad - n_seqs), (0, 0)),
                      constant_values=NOCODE)
    mask_l = jnp.pad(mask_leaf, (0, pad - n_seqs))

    def body(k, carry):
        accum, w_sum = carry
        blk = jax.lax.dynamic_slice_in_dim(codes_l, k * CHUNK, CHUNK, 0)
        mb = jax.lax.dynamic_slice_in_dim(mask_l, k * CHUNK, CHUNK, 0)
        u_l, w_l = kernels.leaf_u(blk, code_freq, U.dtype)
        mf = mb.astype(U.dtype)
        accum = accum + jnp.einsum("m,mpc->pc", mf, u_l)
        w_sum = w_sum + jnp.einsum("m,mp->p", mf, w_l)
        return accum, w_sum

    accum, w_sum = jax.lax.fori_loop(0, n_chunks, body, (accum, w_sum))
    w_out = jnp.maximum(w_sum / jnp.maximum(n, 1), 1e-20)
    nC = code_freq.shape[0]
    fallback = code_freq[0] if use_matrix else jnp.full(
        (C,), 1.0 / nC, dtype=U.dtype)
    f_out = kernels.normalize_freq(accum, et, fallback, tol)
    return w_out, f_out


@functools.partial(jax.jit, static_argnames=("n_seqs", "use_matrix", "two_tier", "tol"))
def _outprofile_update(w_out, f_out, codes, W, U, i, j, newnode, n_active_old,
                       n_seqs, code_freq, eigentot, use_matrix, two_tier, tol):
    rows = jnp.stack([i, j, newnode])
    _, wg, ug = _rows_cwu(codes, W, U, rows, code_freq, n_seqs, two_tier)
    return kernels.update_out_profile(
        w_out, f_out, ug[0], wg[0], ug[1], wg[1], ug[2], wg[2],
        n_active_old, code_freq, eigentot if use_matrix else None, tol)


def _avg_sweep_impl(codes, W, U, tbl_t, tbl_i, tbl_j, n_seqs, code_freq,
                    eigentot, use_matrix, two_tier, tol):
    """A RUN of tree levels' balanced averages in ONE donated dispatch.

    tbl_* are [L, K] index tables (level-major, -1 padding); level k+1 reads
    rows level k wrote, so the sweep is a fori_loop.  Rationale: a donated
    jit call pays ~4.6 ms of host dispatch overhead (donation forces the
    Python pjit path) vs 0.4 ms undonated -- per-LEVEL donated calls made
    every levelwise phase dispatch-bound.  One call per bucket run
    amortizes it."""
    def body(k, carry):
        codes, W, U = carry
        t = tbl_t[k]
        ii = jnp.clip(tbl_i[k], 0, codes.shape[0] - 1)
        jj = jnp.clip(tbl_j[k], 0, codes.shape[0] - 1)
        c1, w1, u1 = _rows_cwu(codes, W, U, ii, code_freq, n_seqs, two_tier)
        c2, w2, u2 = _rows_cwu(codes, W, U, jj, code_freq, n_seqs, two_tier)
        f = jax.vmap(lambda ci, wi, ui, cj, wj, uj: kernels.average_profile(
            ci, wi, ui, cj, wj, uj, jnp.asarray(0.5, dtype=W.dtype),
            code_freq, eigentot if use_matrix else None, tol))
        c, w, u, _ = f(c1, w1, u1, c2, w2, u2)
        valid = t >= 0
        ctgt = jnp.where(valid, t, codes.shape[0])
        codes = codes.at[ctgt].set(c, mode="drop")
        phys = t - n_seqs if two_tier else t
        ptgt = jnp.where(valid, phys, W.shape[0])
        W = W.at[ptgt].set(w, mode="drop")
        U = U.at[ptgt].set(u, mode="drop")
        return codes, W, U

    return jax.lax.fori_loop(0, tbl_t.shape[0], body, (codes, W, U))


_avg_sweep = _dual_jit(_avg_sweep_impl,
                       ("n_seqs", "use_matrix", "two_tier", "tol"), (0, 1, 2))


def _level_runs(levels, n_float=0):
    """Group consecutive levels into runs sharing a pow2 width bucket.

    levels: dependency-ordered list of per-level tuples
    (targets, iis, jjs[, f1, f2, ...]) where the trailing n_float entries
    are float columns (e.g. branch lengths).  Returns a list of table
    tuples [L_pow2, K] (-1 pads on targets; zeros elsewhere) -- a handful
    of table shapes regardless of tree shape, so the fused sweep jits stay
    in-memory cached across rounds."""
    runs = []
    cur = []
    cur_k = None
    for lv in levels:
        n = len(lv[0])
        # floor of 64: the (many) narrow top-of-tree levels merge into one
        # run -- a few x of padding waste on trivially small levels buys a
        # run count of ~log2(max width) - 5 dispatches per sweep
        k = max(64, 1 << (n - 1).bit_length())
        if cur_k is None or k == cur_k:
            cur.append(lv)
            cur_k = k
        else:
            runs.append((cur_k, cur))
            cur, cur_k = [lv], k
    if cur:
        runs.append((cur_k, cur))
    out = []
    n_int = len(levels[0]) - n_float
    for k, lvs in runs:
        L = max(1, 1 << (len(lvs) - 1).bit_length())
        tabs = [np.full((L, k), -1, dtype=np.int64)]
        tabs += [np.zeros((L, k), dtype=np.int64) for _ in range(n_int - 1)]
        tabs += [np.zeros((L, k), dtype=np.float64) for _ in range(n_float)]
        for r, cols in enumerate(lvs):
            for c, col in enumerate(cols):
                tabs[c][r, : len(col)] = col
        out.append(tuple(tabs))
    return out


def _avg_scatter_rows_impl(codes, W, U, targets, iis, jjs, bws, n_seqs,
                           code_freq, eigentot, use_matrix, two_tier, tol):
    """Fused gather -> averageProfile -> scatter on the donated store.

    One jitted dispatch per pow2 bucket shape.  The unfused
    average_rows_batch + scatter_rows pair sliced results to the EXACT
    level size, so every tree level of every NNI round presented a fresh
    shape -- each eager scatter then paid a persistent-compilation-cache
    disk read (~17 ms) instead of an in-memory hit, 6+ s per round at
    N=2000 on the live backend.  Padded targets (< 0) scatter-drop."""
    c1, w1, u1 = _rows_cwu(codes, W, U, iis, code_freq, n_seqs, two_tier)
    c2, w2, u2 = _rows_cwu(codes, W, U, jjs, code_freq, n_seqs, two_tier)
    f = jax.vmap(lambda ci, wi, ui, cj, wj, uj, bw: kernels.average_profile(
        ci, wi, ui, cj, wj, uj, bw, code_freq,
        eigentot if use_matrix else None, tol))
    c, w, u, _ = f(c1, w1, u1, c2, w2, u2, bws)
    valid = targets >= 0
    ctgt = jnp.where(valid, targets, codes.shape[0])
    codes = codes.at[ctgt].set(c, mode="drop")
    phys = targets - n_seqs if two_tier else targets
    ptgt = jnp.where(valid, phys, W.shape[0])
    W = W.at[ptgt].set(w, mode="drop")
    U = U.at[ptgt].set(u, mode="drop")
    return codes, W, U


_avg_scatter_rows = _dual_jit(
    _avg_scatter_rows_impl,
    ("n_seqs", "use_matrix", "two_tier", "tol"), (0, 1, 2))


def hbm_plan(n_seqs: int, n_pos: int, n_codes: int = 4,
             double_precision: bool = False, two_tier: bool | None = None,
             n_devices: int = 1, position_align: int = 128,
             tile_m: int = 256) -> dict:
    """HBM budget of the ME profile store for (N, P, C, devices) -- the fit
    formula replacing the reference's DiskMemory spill planning (ref
    src/DiskMemory.cpp:45-124; SURVEY.md section 5.7).

    Row layout: n_rows = 2*maxnodes = 4*N rows (node + up-profile slots).
    two-tier: leaves live as int8 codes only; float rows cover the 3*N
    internal/up rows.  Position sharding ('sp') divides every per-position
    axis across devices, so per_device_bytes is the number that must fit one
    chip's HBM (16 GiB on v5e).

    Example (the 1M-taxa CSD north star, P~1300, nt, fp32, two-tier):
    total ~87 GB -> ~11 GB/chip on an 8-chip v5e slice.
    """
    if two_tier is None:
        two_tier = n_seqs >= 20000
    esz = 8 if double_precision else 4
    p_pad = ((n_pos + position_align - 1) // position_align) * position_align
    maxnodes = 2 * n_seqs
    n_rows = ((2 * maxnodes + tile_m - 1) // tile_m) * tile_m
    codes_b = n_rows * p_pad  # int8
    if two_tier:
        n_float = n_rows - n_seqs
        n_float = ((n_float + tile_m - 1) // tile_m) * tile_m
    else:
        n_float = n_rows
    w_b = n_float * p_pad * esz
    u_b = n_float * p_pad * n_codes * esz
    out_b = p_pad * (n_codes + 1) * esz
    total = codes_b + w_b + u_b + out_b
    return {
        "n_rows": n_rows, "p_pad": p_pad, "two_tier": two_tier,
        "codes_bytes": codes_b, "w_bytes": w_b, "u_bytes": u_b,
        "total_bytes": total,
        "per_device_bytes": total // max(n_devices, 1),
        "fits_v5e_chip": total // max(n_devices, 1) < 15 * 2**30,
    }


def _shard_put(x, mesh, spec):
    """device_put with a NamedSharding when a mesh is live, else plain asarray.

    This is the whole multi-chip integration contract for the stores: the big
    arrays carry NamedShardings (positions on 'sp', rows on 'dp') and GSPMD
    propagates them through every jitted kernel, inserting psum/all-gather
    collectives for the cross-position contractions (SURVEY.md section 5.8's
    mapping of the reference's OpenMP loops onto XLA collectives)."""
    if mesh is None:
        return jnp.asarray(x)
    from jax.sharding import NamedSharding, PartitionSpec
    return jax.device_put(jnp.asarray(x), NamedSharding(mesh, PartitionSpec(*spec)))


class MEProfiles:
    def __init__(self, leaf_codes: np.ndarray, options, dmat, maxnodes: int,
                 two_tier: bool | None = None):
        self.options = options
        n_seqs, n_pos = leaf_codes.shape
        self.n_seqs = n_seqs
        self.n_pos = n_pos
        pa = options.position_align
        self.p_pad = ((n_pos + pa - 1) // pa) * pa
        self.n_codes = options.n_codes
        self.use_matrix = dmat is not None
        self.dmat = dmat
        dtype = np.float64 if options.double_precision else np.float32
        self.dtype = dtype
        self.tol = float(options.f_post_total_tolerance)
        if two_tier is None:
            tt_min = getattr(options, "two_tier_min", 20000)
            two_tier = tt_min >= 0 and n_seqs >= tt_min
        self.two_tier = bool(two_tier)

        if self.use_matrix:
            self.code_freq = jnp.asarray(dmat.code_freq, dtype=dtype)
            self.eigenval = jnp.asarray(dmat.eigenval, dtype=dtype)
            self.eigentot = jnp.asarray(dmat.eigentot, dtype=dtype)
        else:
            self.code_freq = jnp.eye(self.n_codes, dtype=dtype)
            self.eigenval = jnp.zeros(self.n_codes, dtype=dtype)
            self.eigentot = jnp.ones(self.n_codes, dtype=dtype)

        self.maxnodes = maxnodes
        self.mesh = getattr(options, "mesh", None)
        from ..ops.pallas_kernels import TILE_M
        n_rows = ((2 * maxnodes + TILE_M - 1) // TILE_M) * TILE_M
        self.n_rows = n_rows
        codes = np.full((n_rows, self.p_pad), NOCODE, dtype=np.int8)
        codes[:n_seqs, :n_pos] = leaf_codes
        self.codes = _shard_put(codes, self.mesh, (None, "sp"))

        # two-tier float rows are TILE_M-aligned so the Pallas internal scan
        # can tile them directly (extra rows stay all-zero and are masked)
        n_float_rows = n_rows - n_seqs if self.two_tier else n_rows
        if self.two_tier:
            n_float_rows = ((n_float_rows + TILE_M - 1) // TILE_M) * TILE_M
        W = np.zeros((n_float_rows, self.p_pad), dtype=dtype)
        U = np.zeros((n_float_rows, self.p_pad, self.n_codes), dtype=dtype)
        if not self.two_tier:
            W[:n_seqs, :n_pos] = (leaf_codes != NOCODE).astype(dtype)
            cf = np.asarray(self.code_freq)
            safe = np.where(leaf_codes == NOCODE, 0, leaf_codes).astype(np.int32)
            U[:n_seqs, :n_pos] = cf[safe] * (leaf_codes != NOCODE)[..., None]
        self.W = _shard_put(W, self.mesh, ("dp", "sp"))
        self.U = _shard_put(U, self.mesh, ("dp", "sp", None))
        self.n_gaps = np.asarray((leaf_codes == NOCODE).sum(axis=1), dtype=np.int64)
        self.w_out = None
        self.f_out = None
        # monotone version of the out-profile; host-side raw-distance caches
        # (nj._out_raw) are valid only while this is unchanged
        self.out_version = 0

    def _phys(self, row):
        """Physical float-array index of a (non-leaf) row in two-tier mode."""
        return row - self.n_seqs if self.two_tier else row

    def up_row(self, node: int) -> int:
        """Row index of a node's up-profile slot."""
        return self.maxnodes + node

    # -- out-profile ---------------------------------------------------------
    def recompute_outprofile(self, active_mask: np.ndarray) -> None:
        self.out_version += 1
        full = np.zeros(max(self.n_rows, self.n_seqs + self.U.shape[0]),
                        dtype=bool)
        full[: len(active_mask)] = active_mask
        mask_leaf = jnp.asarray(full[: self.n_seqs])
        n_int = self.U.shape[0]
        mask_int = jnp.asarray(full[self.n_seqs: self.n_seqs + n_int]
                               if self.two_tier else full[: n_int])
        if self.two_tier:
            self.w_out, self.f_out = _outprofile_full(
                self.codes, self.W, self.U, mask_leaf, mask_int, self.n_seqs,
                self.code_freq, self.eigentot, self.use_matrix, True, self.tol)
        else:
            self.w_out, self.f_out = _outprofile_full(
                self.codes, self.W, self.U, mask_leaf,
                jnp.asarray(full[self.n_seqs:]), self.n_seqs,
                self.code_freq, self.eigentot, self.use_matrix, False, self.tol)

    def update_outprofile(self, i: int, j: int, newnode: int, n_active_old: int) -> None:
        self.out_version += 1
        self.w_out, self.f_out = _outprofile_update(
            self.w_out, self.f_out, self.codes, self.W, self.U, i, j, newnode,
            n_active_old, self.n_seqs, self.code_freq, self.eigentot,
            self.use_matrix, self.two_tier, self.tol)

    def out_query(self):
        """Out-profile as a (u, w) query for distance scans."""
        return self.w_out[:, None] * self.f_out, self.w_out

    # -- row access ----------------------------------------------------------
    def row_query(self, i: int):
        """(u, w) of a single row (expanding leaves on the fly)."""
        rows = jnp.asarray(np.array([i], dtype=np.int64))
        _, w, u = _rows_cwu(self.codes, self.W, self.U, rows, self.code_freq,
                            self.n_seqs, self.two_tier)
        return u[0], w[0]

    # -- distance scans ------------------------------------------------------
    def dist_one_vs_all(self, i: int):
        from ..ops import pallas_kernels as pk
        uq, wq = self.row_query(i)
        pallas_ok = (pk._have_pallas_tpu() and self.p_pad % 128 == 0
                     and (self.p_pad * self.n_codes) % 128 == 0
                     and self.U.shape[0] % pk.TILE_M == 0)
        if pallas_ok and self.two_tier:
            # fused two-tier scan: leaves stream as int8 codes, one HBM pass
            _, _, d, w, _ = pk.nj_scan_two_tier(
                self.codes, self.W, self.U, uq, wq,
                jnp.zeros(self.n_seqs + self.U.shape[0], dtype=self.dtype), 3,
                self.n_seqs,
                self.eigenval if self.use_matrix else None, self.code_freq)
        elif pallas_ok:
            # fused Pallas scan: one pass over HBM for dist+denom
            _, _, d, w, _ = pk.nj_scan(
                self.U, self.W, uq, wq,
                jnp.zeros(self.U.shape[0], dtype=self.dtype), 3,
                np.asarray(self.eigenval) if self.use_matrix else None)
        else:
            out = fetch_np(_dist_all(
                self.codes, self.W, self.U, uq, wq, self.n_seqs,
                self.eigenval, self.code_freq, self.use_matrix,
                self.two_tier, _accum_dtype()), np.float64)
            half = len(out) // 2
            return out[:half], out[half:]
        return fetch_np(d, np.float64), fetch_np(w, np.float64)

    def dist_many_vs_leaves(self, rows: np.ndarray):
        """Wave seed scan: [K] query rows vs all leaves -> (dist, weight)
        numpy arrays of shape [K, n_seqs]."""
        rpad, n = _pad_pow2(np.asarray(rows, dtype=np.int64))
        out = fetch_np(_dist_many_vs_leaves(
            self.codes, self.W, self.U, jnp.asarray(rpad), self.n_seqs,
            self.eigenval, self.code_freq, self.use_matrix, self.two_tier,
            _accum_dtype()), np.float64)
        K = len(rpad)
        return out[:n], out[K: K + n]

    def dist_leaves_topk(self, rows: np.ndarray, od: np.ndarray, k: int):
        """Wave seed scan, top-k by criterion on device (see _leaf_topk).
        Returns (idx [K,k] int64, dist [K,k], weight [K,k]) ascending."""
        rpad, n = _pad_pow2(np.asarray(rows, dtype=np.int64))
        out = fetch_np(_leaf_topk(
            self.codes, self.W, self.U, jnp.asarray(rpad),
            jnp.asarray(od, dtype=np.float64 if _accum_dtype() is not None
                        else self.dtype),
            self.n_seqs, self.eigenval, self.code_freq, self.use_matrix,
            self.two_tier, k, _accum_dtype()), np.float64)
        return (out[:n, :k].astype(np.int64), out[:n, k: 2 * k],
                out[:n, 2 * k:])

    def dist_one_vs_set(self, i: int, js: np.ndarray):
        uq, wq = self.row_query(i)
        jpad, n = _pad_pow2(np.asarray(js, dtype=np.int64))
        out = fetch_np(_dist_gather(
            self.codes, self.W, self.U, jnp.asarray(jpad), uq, wq,
            self.n_seqs, self.eigenval, self.code_freq, self.use_matrix,
            self.two_tier, _accum_dtype()), np.float64)
        K = len(jpad)
        return out[:n], out[K: K + n]

    def dist_pairs(self, iis: np.ndarray, jjs: np.ndarray):
        ipad, n = _pad_pow2(np.asarray(iis, dtype=np.int64))
        jpad, _ = _pad_pow2(np.asarray(jjs, dtype=np.int64))
        out = fetch_np(_dist_rows(
            self.codes, self.W, self.U, jnp.asarray(ipad), jnp.asarray(jpad),
            self.n_seqs, self.eigenval, self.code_freq, self.use_matrix,
            self.two_tier, _accum_dtype()), np.float64)
        K = len(ipad)
        return out[:n], out[K: K + n]

    def dist_pieces_pairs(self, iis: np.ndarray, jjs: np.ndarray):
        """[K, n_pos] weighted distance pieces + weights for bootstrap resampling."""
        ipad, n = _pad_pow2(np.asarray(iis, dtype=np.int64))
        jpad, _ = _pad_pow2(np.asarray(jjs, dtype=np.int64))
        p, w = _dist_pieces(self.codes, self.W, self.U, jnp.asarray(ipad),
                            jnp.asarray(jpad), self.n_seqs, self.eigenval,
                            self.code_freq, self.use_matrix, self.two_tier)
        return (fetch_np(p, np.float64)[:n, : self.n_pos],
                fetch_np(w, np.float64)[:n, : self.n_pos])

    def refresh_and_pairs(self, rrows: np.ndarray, iis: np.ndarray,
                          jjs: np.ndarray):
        """Fused out-profile scan of `rrows` + pair distances of (iis, jjs):
        one dispatch, one fetch.  Returns (d_out, w_out_, d_pair, w_pair)."""
        rpad, n_r = _pad_pow2(np.asarray(rrows, dtype=np.int64))
        ipad, n_k = _pad_pow2(np.asarray(iis, dtype=np.int64))
        jpad, _ = _pad_pow2(np.asarray(jjs, dtype=np.int64))
        out = _refresh_and_pairs(
            self.codes, self.W, self.U, self.w_out, self.f_out,
            jnp.asarray(rpad), jnp.asarray(ipad), jnp.asarray(jpad),
            self.n_seqs, self.eigenval, self.code_freq, self.use_matrix,
            self.two_tier, _accum_dtype())
        out = fetch_np(out, np.float64)
        R, K = len(rpad), len(ipad)
        return (out[:n_r], out[R: R + n_r],
                out[2 * R: 2 * R + n_k], out[2 * R + K: 2 * R + K + n_k])

    def dist_set_vs_out(self, idx: np.ndarray):
        """profileDist(node, outprofile) for a set of nodes -> (dist, weight)."""
        uq, wq = self.out_query()
        ipad, n = _pad_pow2(np.asarray(idx, dtype=np.int64))
        out = fetch_np(_dist_gather(
            self.codes, self.W, self.U, jnp.asarray(ipad), uq, wq,
            self.n_seqs, self.eigenval, self.code_freq, self.use_matrix,
            self.two_tier, _accum_dtype()), np.float64)
        K = len(ipad)
        return out[:n], out[K: K + n]

    # -- profile construction ------------------------------------------------
    def join(self, i: int, j: int, newnode: int, bionj_weight: float):
        """averageProfile into newnode; returns (selfdist, selfweight) of it."""
        bw = 0.5 if bionj_weight < 0 else bionj_weight
        assert newnode >= self.n_seqs
        self.codes, self.W, self.U = _join_update(
            self.codes, self.W, self.U, i, j, newnode, self._phys(newnode),
            self.dtype(bw), self.n_seqs, self.code_freq, self.eigenval,
            self.eigentot, self.use_matrix, self.two_tier, self.tol)
        # self-distance with double accumulation (ref profileDist)
        d, wt = self.dist_pairs([newnode], [newnode])
        return float(d[0]), float(wt[0])

    def set_from_average(self, node: int, i: int, j: int, bionj_weight: float) -> None:
        bw = 0.5 if bionj_weight < 0 else bionj_weight
        assert node >= self.n_seqs
        self.codes, self.W, self.U = _join_update(
            self.codes, self.W, self.U, i, j, node, self._phys(node),
            self.dtype(bw), self.n_seqs, self.code_freq, self.eigenval,
            self.eigentot, self.use_matrix, self.two_tier, self.tol)

    def store_bytes(self) -> int:
        return self.U.size * self.U.dtype.itemsize

    def average_sweep(self, levels) -> None:
        """Balanced-average level sweep: `levels` is a dependency-ordered
        list of (targets, iis, jjs); one dispatch per bucket run
        (see _avg_sweep / _level_runs)."""
        fn = _pick(_avg_sweep, self.store_bytes())
        for t, i, j in _level_runs(levels):
            self.codes, self.W, self.U = fn(
                self.codes, self.W, self.U, jnp.asarray(t), jnp.asarray(i),
                jnp.asarray(j), self.n_seqs, self.code_freq, self.eigentot,
                self.use_matrix, self.two_tier, self.tol)

    def average_scatter_rows(self, targets, iis, jjs, bws) -> None:
        """Fused batched averageProfile + scatter into the store (one
        dispatch per pow2 bucket; see _avg_scatter_rows)."""
        targets = np.asarray(targets, dtype=np.int64)
        assert (targets >= self.n_seqs).all()
        tpad, n = _pad_pow2(targets, fill=-1)
        ipad, _ = _pad_pow2(np.asarray(iis, dtype=np.int64))
        jpad, _ = _pad_pow2(np.asarray(jjs, dtype=np.int64))
        bpad = np.full(len(tpad), 0.5, dtype=self.dtype)
        bpad[:n] = np.asarray(bws, dtype=self.dtype)
        self.codes, self.W, self.U = _pick(
            _avg_scatter_rows, self.store_bytes())(
            self.codes, self.W, self.U, jnp.asarray(tpad), jnp.asarray(ipad),
            jnp.asarray(jpad), jnp.asarray(bpad), self.n_seqs,
            self.code_freq, self.eigentot, self.use_matrix, self.two_tier,
            self.tol)

