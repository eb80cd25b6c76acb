"""Device-resident profile store (minimum-evolution phase).

TPU-native replacement for the reference's per-node heap/mmap Profile objects
(ref NeighbourJoining.h:126-161, DiskMemory): all profiles live in three fixed
-shape device arrays

    codes   int8 [maxnodes, P]   (NOCODE marks stored-vector / gap positions)
    W       f32  [maxnodes, P]   (non-gap weights)
    U       f32  [maxnodes, P, C] (weight * rotated frequency vector)

padded along P to a lane multiple.  The sparse "only store vectors for
ambiguous positions" encoding of the reference collapses into U exactly (a
coded position's implicit vector is the rotated one-hot codeFreq[c]; identity:
codeFreq[c1].(eigenval*codeFreq[c2]) == distances[c1][c2]), so every distance
scan is a dense matmul and seqDist/profileDist/codeDist become one code path.

The out-profile (average of active nodes, ref tcc:729-815) is stored alongside
as (w_out[P], f_out[P,C]) frequencies.

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


@functools.partial(jax.jit, static_argnames=("use_matrix", "up"))
def _dist_many(U, W, uq, wq, eigenval, use_matrix, up=None):
    if up is not None:
        U, W, uq, wq, eigenval = (x.astype(up) for x in (U, W, uq, wq, eigenval))
    return kernels.me_dist_many(U, W, uq, wq, eigenval if use_matrix else None)


@functools.partial(jax.jit, static_argnames=("use_matrix", "up"))
def _dist_gather(U, W, js, uq, wq, eigenval, use_matrix, up=None):
    Uj, Wj = U[js], W[js]
    if up is not None:
        Uj, Wj, uq, wq, eigenval = (x.astype(up) for x in (Uj, Wj, uq, wq, eigenval))
    return kernels.me_dist_many(Uj, Wj, uq, wq,
                                eigenval if use_matrix else None)


@functools.partial(jax.jit, static_argnames=("use_matrix", "up"))
def _dist_rows(U, W, iis, jjs, eigenval, use_matrix, up=None):
    U1, W1, U2, W2 = U[iis], W[iis], U[jjs], W[jjs]
    if up is not None:
        U1, W1, U2, W2, eigenval = (x.astype(up) for x in (U1, W1, U2, W2, eigenval))
    return kernels.me_dist_rows(U1, W1, U2, W2,
                                eigenval if use_matrix else None)


@functools.partial(jax.jit, static_argnames=("use_matrix",))
def _dist_pieces(U, W, iis, jjs, eigenval, use_matrix):
    """Per-position weighted distance pieces for row pairs -> ([K,P], [K,P])."""
    U1, W1 = U[iis], W[iis]
    U2, W2 = U[jjs], W[jjs]
    weights = W1 * W2
    dots = jnp.einsum("kpc,kpc->kp", U1, U2)
    if use_matrix:
        pieces = jnp.einsum("kpc,kpc,c->kp", U1, U2, eigenval)
    else:
        pieces = weights - dots
    return pieces, weights


@functools.partial(jax.jit, static_argnames=("use_matrix", "tol"), donate_argnums=(0, 1, 2))
def _join_update(codes, W, U, i, j, newnode, bw, code_freq, eigenval, eigentot,
                 use_matrix, tol):
    c, w, u, _ = kernels.average_profile(
        codes[i], W[i], U[i], codes[j], W[j], U[j], bw, code_freq,
        eigentot if use_matrix else None, tol)
    codes = codes.at[newnode].set(c)
    W = W.at[newnode].set(w)
    U = U.at[newnode].set(u)
    d, wt = kernels.me_dist_rows(u[None], w[None], u[None], w[None],
                                 eigenval if use_matrix else None)
    return codes, W, U, d[0], wt[0]


@functools.partial(jax.jit, static_argnames=("use_matrix", "tol"))
def _outprofile_full(U, W, mask, code_freq, eigentot, use_matrix, tol):
    return kernels.out_profile(U, W, mask, code_freq,
                               eigentot if use_matrix else None, tol)


@functools.partial(jax.jit, static_argnames=("use_matrix", "tol"))
def _outprofile_update(w_out, f_out, U, W, i, j, newnode, n_active_old,
                       code_freq, eigentot, use_matrix, tol):
    return kernels.update_out_profile(
        w_out, f_out, U[i], W[i], U[j], W[j], U[newnode], W[newnode],
        n_active_old, code_freq, eigentot if use_matrix else None, tol)


@functools.partial(jax.jit, static_argnames=("use_matrix", "tol"))
def _avg_rows(codes, W, U, iis, jjs, bws, code_freq, eigenval, eigentot,
              use_matrix, tol):
    """Batched averageProfile over row pairs -> (codes, w, u) stacks."""
    f = jax.vmap(lambda ci, wi, ui, cj, wj, uj, bw: kernels.average_profile(
        ci, wi, ui, cj, wj, uj, bw, code_freq,
        eigentot if use_matrix else None, tol))
    c, w, u, _ = f(codes[iis], W[iis], U[iis], codes[jjs], W[jjs], U[jjs], bws)
    return c, w, u


class MEProfiles:
    def __init__(self, leaf_codes: np.ndarray, options, dmat, maxnodes: int):
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

        if self.use_matrix:
            self.code_freq = jnp.asarray(dmat.code_freq, dtype=dtype)
            self.eigenval = jnp.asarray(dmat.eigenval, dtype=dtype)
            self.eigentot = jnp.asarray(dmat.eigentot, dtype=dtype)
        else:
            self.code_freq = jnp.eye(self.n_codes, dtype=dtype)
            self.eigenval = jnp.zeros(self.n_codes, dtype=dtype)
            self.eigentot = jnp.ones(self.n_codes, dtype=dtype)

        # rows [0, maxnodes) are node profiles; rows [maxnodes, 2*maxnodes)
        # are the "up-profile" slots (rest-of-tree profiles, ref getUpProfile
        # tcc:3382-3434) so every batched op can address both uniformly.
        # Rows are padded to the Pallas scan tile so the fused TPU kernel
        # applies without repacking.
        self.maxnodes = maxnodes
        from ..ops.pallas_kernels import TILE_M
        n_rows = ((2 * maxnodes + TILE_M - 1) // TILE_M) * TILE_M
        codes = np.full((n_rows, self.p_pad), NOCODE, dtype=np.int8)
        codes[:n_seqs, :n_pos] = leaf_codes
        W = np.zeros((n_rows, self.p_pad), dtype=dtype)
        W[:n_seqs, :n_pos] = (leaf_codes != NOCODE).astype(dtype)
        cf = np.asarray(self.code_freq)
        safe = np.where(leaf_codes == NOCODE, 0, leaf_codes).astype(np.int32)
        V = cf[safe] * (leaf_codes != NOCODE)[..., None]
        U = np.zeros((n_rows, self.p_pad, self.n_codes), dtype=dtype)
        U[:n_seqs, :n_pos] = V
        self.codes = jnp.asarray(codes)
        self.W = jnp.asarray(W)
        self.U = jnp.asarray(U)
        self.n_gaps = np.asarray((leaf_codes == NOCODE).sum(axis=1), dtype=np.int64)
        self.w_out = None
        self.f_out = None

    def up_row(self, node: int) -> int:
        """Row index of a node's up-profile slot."""
        return self.maxnodes + node

    # -- out-profile ---------------------------------------------------------
    def recompute_outprofile(self, active_mask: np.ndarray) -> None:
        if len(active_mask) < self.U.shape[0]:
            full = np.zeros(self.U.shape[0], dtype=bool)
            full[: len(active_mask)] = active_mask
            active_mask = full
        mask = jnp.asarray(active_mask)
        self.w_out, self.f_out = _outprofile_full(
            self.U, self.W, mask, self.code_freq, self.eigentot,
            self.use_matrix, self.tol)

    def update_outprofile(self, i: int, j: int, newnode: int, n_active_old: int) -> None:
        self.w_out, self.f_out = _outprofile_update(
            self.w_out, self.f_out, self.U, self.W, i, j, newnode,
            n_active_old, self.code_freq, self.eigentot, self.use_matrix, self.tol)

    def out_query(self):
        """Out-profile as a (u, w) query for distance scans."""
        return self.w_out[:, None] * self.f_out, self.w_out

    # -- distance scans ------------------------------------------------------
    def dist_one_vs_all(self, i: int):
        from ..ops import pallas_kernels as pk
        if pk._have_pallas_tpu() and self.U.shape[0] % pk.TILE_M == 0 \
                and self.p_pad % 128 == 0:
            # fused Pallas scan: one pass over HBM for dist+denom
            _, _, d, w, _ = pk.nj_scan(
                self.U, self.W, self.U[i], self.W[i],
                jnp.zeros(self.U.shape[0], dtype=self.dtype), 3,
                np.asarray(self.eigenval) if self.use_matrix else None)
        else:
            d, w = _dist_many(self.U, self.W, self.U[i], self.W[i],
                              self.eigenval, self.use_matrix, _accum_dtype())
        return np.asarray(d, dtype=np.float64), np.asarray(w, dtype=np.float64)

    def dist_one_vs_set(self, i: int, js: np.ndarray):
        jpad, n = _pad_pow2(np.asarray(js, dtype=np.int64))
        d, w = _dist_gather(self.U, self.W, jnp.asarray(jpad), self.U[i],
                            self.W[i], self.eigenval, self.use_matrix,
                            _accum_dtype())
        return np.asarray(d, dtype=np.float64)[:n], np.asarray(w, dtype=np.float64)[:n]

    def dist_pairs(self, iis: np.ndarray, jjs: np.ndarray):
        ipad, n = _pad_pow2(np.asarray(iis, dtype=np.int64))
        jpad, _ = _pad_pow2(np.asarray(jjs, dtype=np.int64))
        d, w = _dist_rows(self.U, self.W, jnp.asarray(ipad), jnp.asarray(jpad),
                          self.eigenval, self.use_matrix, _accum_dtype())
        return np.asarray(d, dtype=np.float64)[:n], np.asarray(w, dtype=np.float64)[:n]

    def dist_pieces_pairs(self, iis: np.ndarray, jjs: np.ndarray):
        """[K, n_pos] weighted distance pieces + weights for bootstrap resampling."""
        ipad, n = _pad_pow2(np.asarray(iis, dtype=np.int64))
        jpad, _ = _pad_pow2(np.asarray(jjs, dtype=np.int64))
        p, w = _dist_pieces(self.U, self.W, jnp.asarray(ipad), jnp.asarray(jpad),
                            self.eigenval, self.use_matrix)
        return (np.asarray(p, dtype=np.float64)[:n, : self.n_pos],
                np.asarray(w, dtype=np.float64)[:n, : self.n_pos])

    def dist_set_vs_out(self, idx: np.ndarray):
        """profileDist(node, outprofile) for a set of nodes -> (dist, weight)."""
        uq, wq = self.out_query()
        ipad, n = _pad_pow2(np.asarray(idx, dtype=np.int64))
        d, w = _dist_gather(self.U, self.W, jnp.asarray(ipad), uq, wq,
                            self.eigenval, self.use_matrix, _accum_dtype())
        return np.asarray(d, dtype=np.float64)[:n], np.asarray(w, dtype=np.float64)[:n]

    # -- profile construction ------------------------------------------------
    def join(self, i: int, j: int, newnode: int, bionj_weight: float):
        """averageProfile into newnode; returns (selfdist, selfweight) of it."""
        bw = 0.5 if bionj_weight < 0 else bionj_weight
        self.codes, self.W, self.U, _, _ = _join_update(
            self.codes, self.W, self.U, i, j, newnode, self.dtype(bw),
            self.code_freq, self.eigenval, self.eigentot, self.use_matrix, self.tol)
        # self-distance with double accumulation (ref profileDist)
        d, wt = self.dist_pairs([newnode], [newnode])
        return float(d[0]), float(wt[0])

    def set_from_average(self, node: int, i: int, j: int, bionj_weight: float) -> None:
        bw = 0.5 if bionj_weight < 0 else bionj_weight
        self.codes, self.W, self.U, _, _ = _join_update(
            self.codes, self.W, self.U, i, j, node, self.dtype(bw),
            self.code_freq, self.eigenval, self.eigentot, self.use_matrix, self.tol)

    def average_rows_batch(self, iis, jjs, bws):
        """Batched averageProfile for a level of independent nodes."""
        ipad, n = _pad_pow2(np.asarray(iis, dtype=np.int64))
        jpad, _ = _pad_pow2(np.asarray(jjs, dtype=np.int64))
        bpad = np.full(len(ipad), 0.5, dtype=self.dtype)
        bpad[:n] = np.asarray(bws, dtype=self.dtype)
        c, w, u = _avg_rows(self.codes, self.W, self.U, jnp.asarray(ipad),
                            jnp.asarray(jpad), jnp.asarray(bpad), self.code_freq,
                            self.eigenval, self.eigentot, self.use_matrix, self.tol)
        return c[:n], w[:n], u[:n]

    def scatter_rows(self, nodes, c, w, u) -> None:
        nodes = jnp.asarray(np.asarray(nodes, dtype=np.int64))
        self.codes = self.codes.at[nodes].set(c)
        self.W = self.W.at[nodes].set(w)
        self.U = self.U.at[nodes].set(u)
