"""Device-resident profile store for the maximum-likelihood phase.

After the ME phases, profiles switch to the transition-matrix representation
(ref VeryFastTreeImpl.tcc:252-256: transMatToDistanceMat + recomputeProfiles):
leaves become rotated one-hots codeFreq[code] (gap row for gaps) and internal
nodes are re-averaged bottom-up in the rotated space; subsequent ML ops replace
internal profiles with posterior distributions.

Unlike the ME store (which folds weights into the vectors), the ML store keeps
*raw* vectors V plus codes and weights, because the reference's gap-mixing
rules differ by call site (see ops/kernels.ml_effective):
  - matrix pairLogLk mixes every 0<w<1 position with the gap distribution,
  - posteriorProfile mixes only code-derived positions,
  - Jukes-Cantor mixes only code-derived positions everywhere.
Positions with w == 0 always hold the gap vector (rotation of all-ones for
matrix models; uniform 0.25 for JC), which makes P(gap)=1 fall out of the
dense contraction with no masking beyond the both-gap skip.

Row layout matches the ME store: [0, maxnodes) node profiles,
[maxnodes, 2*maxnodes) up-profiles, plus a few scratch rows for quartet
temporaries (AB, CD, ABC, ...).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import NOCODE
from ..ops import kernels
from .profiles import _dual_jit, _pad_pow2, _pick

N_SCRATCH = 8
# scratch row names used by the quartet optimizer
S_AB, S_CD, S_BCD, S_ACD, S_ABD, S_ABC, S_TMP1, S_TMP2 = range(N_SCRATCH)


def _pad_vals(vals, n, length, fill, dtype):
    """Pad a length-n value vector to `length`.  Accepts device arrays (so
    level-batched sweeps can chain enqueue-only, keeping branch lengths and
    likelihoods device-resident between dispatches) or host sequences."""
    if isinstance(vals, jax.Array):
        return jnp.full((length,), fill, dtype=dtype).at[:n].set(
            vals.astype(dtype))
    out = np.full(length, fill, dtype=dtype)
    out[:n] = vals
    return jnp.asarray(out)


def _pair_loglk_impl(codes, W, V, r1, r2, length, rates, ratecat, eigenval,
                     code_freq, pos_mask, min_rel_len, jc):
    c1, w1, v1 = codes[r1], W[r1], V[r1]
    c2, w2, v2 = codes[r2], W[r2], V[r2]
    f1 = kernels.ml_effective(c1, w1, v1, code_freq, False, jc)
    f2 = kernels.ml_effective(c2, w2, v2, code_freq, False, jc)
    if jc:
        psame, pdiff = kernels.p_same_diff(length, rates)
        return kernels.pair_loglk_jc(f1, f2, psame, pdiff, ratecat, pos_mask)
    ee = kernels.exp_eigen_rates(length, rates, eigenval, min_rel_len)
    return kernels.pair_loglk_matrix(f1, f2, w1, w2, ee, ratecat, pos_mask)


_pair_loglk = functools.partial(jax.jit, static_argnames=("jc",))(_pair_loglk_impl)


@functools.partial(jax.jit, static_argnames=("jc",))
def _pair_loglk_rows(codes, W, V, r1s, r2s, lengths, rates, ratecat, eigenval,
                     code_freq, pos_mask, min_rel_len, jc):
    f = jax.vmap(lambda r1, r2, ln: _pair_loglk_impl(
        codes, W, V, r1, r2, ln, rates, ratecat, eigenval, code_freq,
        pos_mask, min_rel_len, jc))
    return f(r1s, r2s, lengths)


def _posterior_into_impl(codes, W, V, target, r1, r2, len1, len2, rates, ratecat,
                    eigenval, code_freq, statinv, eigeninv, min_rel_len,
                    min_len, jc, tol, use_approx, near_p, near_freq,
                    rough_acc, exact_acc):
    len1 = jnp.maximum(len1, min_len)
    len2 = jnp.maximum(len2, min_len)
    c1, w1, v1 = codes[r1], W[r1], V[r1]
    c2, w2, v2 = codes[r2], W[r2], V[r2]
    f1 = kernels.ml_effective(c1, w1, v1, code_freq, True, jc)
    f2 = kernels.ml_effective(c2, w2, v2, code_freq, True, jc)
    if jc:
        ps1, pd1 = kernels.p_same_diff(len1, rates)
        ps2, pd2 = kernels.p_same_diff(len2, rates)
        w_out, v_out = kernels.posterior_jc(f1, f2, w1, w2, ps1, pd1, ps2, pd2, ratecat)
        gap = jnp.full((V.shape[-1],), 0.25, dtype=V.dtype)
    else:
        ee1 = kernels.exp_eigen_rates(len1, rates, eigenval, min_rel_len)
        ee2 = kernels.exp_eigen_rates(len2, rates, eigenval, min_rel_len)
        n = V.shape[-1]
        approx = _approx_tuple(use_approx, near_p, near_freq)
        w_out, v_out, n_rough, n_exact = kernels.posterior_matrix(
            f1, f2, w1, w2, ee1, ee2, ratecat, code_freq[:n], eigeninv,
            statinv, tol, approx)
        gap = code_freq[NOCODE]
        rough_acc = rough_acc + n_rough
        exact_acc = exact_acc + n_exact
    v_out = jnp.where(w_out[..., None] > 0, v_out, gap)
    codes = codes.at[target].set(jnp.full_like(codes[0], NOCODE))
    W = W.at[target].set(w_out)
    V = V.at[target].set(v_out)
    return codes, W, V, rough_acc, exact_acc


_posterior_into = _dual_jit(_posterior_into_impl,
                            ("jc", "tol", "use_approx"), (0, 1, 2))


def _approx_tuple(use_approx, near_p, near_freq):
    """Static gate for the -approxml rough-posterior path (ref tcc:2390-2421)."""
    if not use_approx:
        return None
    from .. import constants
    return (near_p, near_freq, constants.APPROX_ML_MIN_F,
            constants.APPROX_ML_MIN_RATIO)


def _posterior_sweep_impl(codes, W, V, tbl_t, tbl_1, tbl_2, tbl_l1, tbl_l2, rates,
                     ratecat, eigenval, code_freq, statinv, eigeninv,
                     min_rel_len, min_len, jc, tol, use_approx, near_p,
                     near_freq, rough_acc, exact_acc):
    """A RUN of tree levels' posterior recomputes in ONE donated dispatch
    (tables [L, K], -1 target pads drop).  Donated jit calls pay ~4.6 ms of
    host dispatch overhead each (Python pjit path); per-LEVEL posterior
    calls made recomputeMLProfiles / up-profile sweeps dispatch-bound."""
    def body(k, carry):
        codes, W, V, ra, ea = carry

        def one(r1, r2, l1, l2):
            # closes over the CARRIED store: level k reads level k-1's writes
            l1 = jnp.maximum(l1, min_len)
            l2 = jnp.maximum(l2, min_len)
            c1, w1, v1 = codes[r1], W[r1], V[r1]
            c2, w2, v2 = codes[r2], W[r2], V[r2]
            f1 = kernels.ml_effective(c1, w1, v1, code_freq, True, jc)
            f2 = kernels.ml_effective(c2, w2, v2, code_freq, True, jc)
            if jc:
                ps1, pd1 = kernels.p_same_diff(l1, rates)
                ps2, pd2 = kernels.p_same_diff(l2, rates)
                w_out, v_out = kernels.posterior_jc(f1, f2, w1, w2, ps1, pd1,
                                                    ps2, pd2, ratecat)
                gap = jnp.full((V.shape[-1],), 0.25, dtype=V.dtype)
                n_rough = n_exact = jnp.zeros((), jnp.float32)
            else:
                ee1 = kernels.exp_eigen_rates(l1, rates, eigenval, min_rel_len)
                ee2 = kernels.exp_eigen_rates(l2, rates, eigenval, min_rel_len)
                n = V.shape[-1]
                approx = _approx_tuple(use_approx, near_p, near_freq)
                w_out, v_out, n_rough, n_exact = kernels.posterior_matrix(
                    f1, f2, w1, w2, ee1, ee2, ratecat, code_freq[:n],
                    eigeninv, statinv, tol, approx)
                gap = code_freq[NOCODE]
            v_out = jnp.where(w_out[..., None] > 0, v_out, gap)
            return w_out, v_out, n_rough, n_exact

        t = tbl_t[k]
        r1 = jnp.clip(tbl_1[k], 0, codes.shape[0] - 1)
        r2 = jnp.clip(tbl_2[k], 0, codes.shape[0] - 1)
        w_outs, v_outs, n_roughs, n_exacts = jax.vmap(one)(
            r1, r2, tbl_l1[k], tbl_l2[k])
        valid = t >= 0
        tgt = jnp.where(valid, t, codes.shape[0])
        codes = codes.at[tgt].set(NOCODE, mode="drop")
        W = W.at[tgt].set(w_outs, mode="drop")
        V = V.at[tgt].set(v_outs, mode="drop")
        vf = valid.astype(jnp.float32)
        return (codes, W, V, ra + (n_roughs * vf).sum(),
                ea + (n_exacts * vf).sum())

    return jax.lax.fori_loop(0, tbl_t.shape[0], body,
                             (codes, W, V, rough_acc, exact_acc))


_posterior_sweep = _dual_jit(_posterior_sweep_impl,
                             ("jc", "tol", "use_approx"), (0, 1, 2))


def _posterior_rows_impl(codes, W, V, targets, r1s, r2s, len1s, len2s, valid, rates,
                    ratecat, eigenval, code_freq, statinv, eigeninv, min_rel_len,
                    min_len, jc, tol, use_approx, near_p, near_freq,
                    rough_acc, exact_acc):
    def one(r1, r2, l1, l2):
        l1 = jnp.maximum(l1, min_len)
        l2 = jnp.maximum(l2, min_len)
        c1, w1, v1 = codes[r1], W[r1], V[r1]
        c2, w2, v2 = codes[r2], W[r2], V[r2]
        f1 = kernels.ml_effective(c1, w1, v1, code_freq, True, jc)
        f2 = kernels.ml_effective(c2, w2, v2, code_freq, True, jc)
        if jc:
            ps1, pd1 = kernels.p_same_diff(l1, rates)
            ps2, pd2 = kernels.p_same_diff(l2, rates)
            w_out, v_out = kernels.posterior_jc(f1, f2, w1, w2, ps1, pd1, ps2, pd2,
                                                ratecat)
            gap = jnp.full((V.shape[-1],), 0.25, dtype=V.dtype)
            n_rough = n_exact = jnp.zeros((), jnp.float32)
        else:
            ee1 = kernels.exp_eigen_rates(l1, rates, eigenval, min_rel_len)
            ee2 = kernels.exp_eigen_rates(l2, rates, eigenval, min_rel_len)
            n = V.shape[-1]
            approx = _approx_tuple(use_approx, near_p, near_freq)
            w_out, v_out, n_rough, n_exact = kernels.posterior_matrix(
                f1, f2, w1, w2, ee1, ee2, ratecat, code_freq[:n], eigeninv,
                statinv, tol, approx)
            gap = code_freq[NOCODE]
        v_out = jnp.where(w_out[..., None] > 0, v_out, gap)
        return w_out, v_out, n_rough, n_exact

    w_outs, v_outs, n_roughs, n_exacts = jax.vmap(one)(r1s, r2s, len1s, len2s)
    codes = codes.at[targets].set(NOCODE)
    W = W.at[targets].set(w_outs)
    V = V.at[targets].set(v_outs)
    return (codes, W, V, rough_acc + (n_roughs * valid).sum(),
            exact_acc + (n_exacts * valid).sum())


_posterior_rows = _dual_jit(_posterior_rows_impl,
                            ("jc", "tol", "use_approx"), (0, 1, 2))


class MLProfiles:
    def __init__(self, nj, transmat):
        """Build the ML store from leaf codes + current topology
        (the reference's profile switch, VeryFastTreeImpl.tcc:252-256)."""
        opts = nj.options
        self.options = opts
        self.nj = nj
        self.jc = transmat is None
        self.transmat = transmat
        me = nj.prof
        self.n_pos = me.n_pos
        self.p_pad = me.p_pad
        self.maxnodes = me.maxnodes
        self.n_codes = opts.n_codes
        dtype = me.dtype
        self.dtype = dtype
        self.tol = float(opts.f_post_total_tolerance)
        self.min_len = dtype(opts.ml_min_branch_length)
        self.min_rel_len = dtype(opts.ml_min_rel_branch_length)
        # -approxml rough-posterior gate: AA matrix models only (ref
        # posteriorProfile tcc:2390-2421 sits inside the nCodes==20 branch)
        self.use_approx = (not opts.exact_ml) and opts.n_codes == 20 and not self.jc
        self._rough_acc = jnp.zeros((), jnp.float32)
        self._exact_acc = jnp.zeros((), jnp.float32)

        C = self.n_codes
        if self.jc:
            cf = np.zeros((NOCODE + 1, C), dtype=dtype)
            cf[:C] = np.eye(C)
            cf[NOCODE] = 0.25
            self.code_freq = jnp.asarray(cf)
            self.eigenval = jnp.zeros(C, dtype=dtype)
            self.statinv = jnp.ones(C, dtype=dtype)
            self.eigeninv = jnp.eye(C, dtype=dtype)
            self.eigentot = jnp.ones(C, dtype=dtype)
            self.gap_vec = jnp.full((C,), 0.25, dtype=dtype)
            self.near_p = jnp.zeros((C, C), dtype=dtype)
            self.near_freq = jnp.zeros((C, C), dtype=dtype)
        else:
            self.code_freq = jnp.asarray(transmat.code_freq, dtype=dtype)
            self.eigenval = jnp.asarray(transmat.eigenval, dtype=dtype)
            self.statinv = jnp.asarray(transmat.statinv, dtype=dtype)
            self.eigeninv = jnp.asarray(transmat.eigeninv, dtype=dtype)
            self.eigentot = jnp.asarray(transmat.eigeninv.sum(axis=1), dtype=dtype)
            self.gap_vec = self.code_freq[NOCODE]
            self.near_p = jnp.asarray(transmat.near_p, dtype=dtype)
            self.near_freq = jnp.asarray(transmat.near_freq, dtype=dtype)

        pos_mask = np.zeros(self.p_pad, dtype=bool)
        pos_mask[: self.n_pos] = True
        self.pos_mask = jnp.asarray(pos_mask)

        # CAT rates (ref Rates, NeighbourJoining.h:163-174)
        self.rates_np = np.ones(1, dtype=np.float64)
        self.ratecat_np = np.zeros(self.p_pad, dtype=np.int32)
        self._push_rates()

        # leaf rows from codes; internal rows re-averaged bottom-up.
        # Extra block of maxnodes rows = batch scratch for level-batched
        # posterior temporaries (engine/batched.py).
        self.batch_scratch0 = 2 * self.maxnodes + N_SCRATCH
        n_rows = 3 * self.maxnodes + N_SCRATCH
        codes_np = np.asarray(me.codes)
        leaf_codes = codes_np[: nj.n_seqs]
        codes = np.full((n_rows, self.p_pad), NOCODE, dtype=np.int8)
        codes[: nj.n_seqs] = leaf_codes
        W = np.zeros((n_rows, self.p_pad), dtype=dtype)
        W[: nj.n_seqs] = (leaf_codes != NOCODE).astype(dtype)
        cfn = np.asarray(self.code_freq)
        safe = np.where(leaf_codes == NOCODE, NOCODE, leaf_codes).astype(np.int32)
        V = np.tile(np.asarray(self.gap_vec)[None, None, :],
                    (n_rows, self.p_pad, 1)).astype(dtype)
        V[: nj.n_seqs] = cfn[safe]
        from .profiles import _shard_put
        self.mesh = getattr(opts, "mesh", None)
        self.codes = _shard_put(codes, self.mesh, (None, "sp"))
        self.W = _shard_put(W, self.mesh, ("dp", "sp"))
        self.V = _shard_put(V, self.mesh, ("dp", "sp", None))
        self.recompute_average_profiles()

    def set_transmat(self, transmat) -> None:
        """Swap in a new transition matrix (GTR refitting, ref setMLGtr
        tcc:6424): rebuild the rotation constants and the leaf rows.  Also
        upgrades a Jukes-Cantor store to matrix mode (the -gtr path starts as
        JC until the first GTR fit, ref VeryFastTreeImpl.tcc:261)."""
        self.jc = False
        self.transmat = transmat
        dtype = self.dtype
        self.code_freq = jnp.asarray(transmat.code_freq, dtype=dtype)
        self.eigenval = jnp.asarray(transmat.eigenval, dtype=dtype)
        self.statinv = jnp.asarray(transmat.statinv, dtype=dtype)
        self.eigeninv = jnp.asarray(transmat.eigeninv, dtype=dtype)
        self.eigentot = jnp.asarray(transmat.eigeninv.sum(axis=1), dtype=dtype)
        self.gap_vec = self.code_freq[NOCODE]
        self.near_p = jnp.asarray(transmat.near_p, dtype=dtype)
        self.near_freq = jnp.asarray(transmat.near_freq, dtype=dtype)
        self.use_approx = (not self.options.exact_ml) and self.n_codes == 20
        nj = self.nj
        codes_np = np.asarray(nj.prof.codes)[: nj.n_seqs]
        cfn = np.asarray(self.code_freq)
        safe = np.where(codes_np == NOCODE, NOCODE, codes_np).astype(np.int32)
        leafV = cfn[safe]
        self.V = self.V.at[: nj.n_seqs].set(jnp.asarray(leafV, dtype=dtype))

    def _push_rates(self):
        self.rates = jnp.asarray(self.rates_np, dtype=self.dtype)
        self.ratecat = jnp.asarray(self.ratecat_np)

    def set_rates(self, rates: np.ndarray, ratecat: np.ndarray) -> None:
        self.rates_np = np.asarray(rates, dtype=np.float64)
        rc = np.zeros(self.p_pad, dtype=np.int32)
        rc[: len(ratecat)] = ratecat
        self.ratecat_np = rc
        self._push_rates()

    def up_row(self, node: int) -> int:
        return self.maxnodes + node

    def store_bytes(self) -> int:
        return self.V.size * self.V.dtype.itemsize

    def scratch_row(self, k: int) -> int:
        return 2 * self.maxnodes + k

    # -- core ops ------------------------------------------------------------
    def pair_loglk(self, r1: int, r2: int, length: float, want_site_lk=False,
                   fetch=True):
        ll, lk = _pair_loglk(self.codes, self.W, self.V, r1, r2,
                             self.dtype(length), self.rates, self.ratecat,
                             self.eigenval, self.code_freq, self.pos_mask,
                             self.min_rel_len, self.jc)
        self.nj.debug.n_lk_compute += 1
        if not fetch:
            return ll, lk[: self.n_pos]
        if want_site_lk:
            return float(ll), np.asarray(lk, dtype=np.float64)[: self.n_pos]
        return float(ll)

    def pair_loglk_rows(self, r1s, r2s, lengths, fetch=True):
        """fetch=False returns device arrays (enqueue-only, no blocking sync)
        so per-level chains can accumulate on device -- see batched.py."""
        r1p, n = _pad_pow2(np.asarray(r1s, dtype=np.int64))
        r2p, _ = _pad_pow2(np.asarray(r2s, dtype=np.int64))
        lp = _pad_vals(lengths, n, len(r1p), 0.0, self.dtype)
        ll, lk = _pair_loglk_rows(self.codes, self.W, self.V, jnp.asarray(r1p),
                                  jnp.asarray(r2p), lp, self.rates,
                                  self.ratecat, self.eigenval, self.code_freq,
                                  self.pos_mask, self.min_rel_len, self.jc)
        self.nj.debug.n_lk_compute += n
        if not fetch:
            return ll[:n], lk[:n, : self.n_pos]
        return (np.asarray(ll, dtype=np.float64)[:n],
                np.asarray(lk, dtype=np.float64)[:n, : self.n_pos])

    def opt_branch_length(self, r1: int, r2: int, guess: float):
        """Device-fused onedimenmin/Brent for one branch (see _opt_branch_len).
        Returns (optimal_length, neg_loglk_at_optimum)."""
        opts = self.options
        x, fx = _opt_branch_len(
            self.codes, self.W, self.V, r1, r2, self.dtype(guess),
            self.dtype(opts.ml_min_branch_length), self.dtype(6.0),
            self.dtype(opts.ml_ftol_branch_length),
            self.dtype(opts.ml_min_branch_length_tolerance),
            self.rates, self.ratecat, self.eigenval, self.code_freq,
            self.pos_mask, self.min_rel_len, self.jc)
        self.nj.debug.n_lk_compute += 8  # approximate eval count for telemetry
        return float(x), float(fx)

    def scratch_rows_for(self, n: int) -> np.ndarray:
        assert n <= self.maxnodes
        return np.arange(self.batch_scratch0, self.batch_scratch0 + n,
                         dtype=np.int64)

    def opt_branch_length_rows(self, r1s, r2s, guesses, fetch=True):
        """Vmapped device Brent across a level -> (lengths, neg_loglks).
        fetch=False returns device arrays (enqueue-only chaining)."""
        opts = self.options
        r1p, n = _pad_pow2(np.asarray(r1s, dtype=np.int64))
        r2p, _ = _pad_pow2(np.asarray(r2s, dtype=np.int64))
        gp = _pad_vals(guesses, n, len(r1p), 0.1, self.dtype)
        xs, fxs = _opt_branch_len_rows(
            self.codes, self.W, self.V, jnp.asarray(r1p), jnp.asarray(r2p),
            gp, self.dtype(opts.ml_min_branch_length),
            self.dtype(6.0), self.dtype(opts.ml_ftol_branch_length),
            self.dtype(opts.ml_min_branch_length_tolerance), self.rates,
            self.ratecat, self.eigenval, self.code_freq, self.pos_mask,
            self.min_rel_len, self.jc)
        self.nj.debug.n_lk_compute += 8 * n
        if not fetch:
            return xs[:n], fxs[:n]
        return (np.asarray(xs, dtype=np.float64)[:n],
                np.asarray(fxs, dtype=np.float64)[:n])

    def quartet_nni_rows(self, rows, lengths, chunk: int = 256):
        """Batched full ML quartet NNI (see _quartet_nni_core).  rows [K,4],
        lengths [K,5] -> (choice [K], criteria [K,3], new_len [K,5])."""
        opts = self.options
        K = len(rows)
        choices = np.zeros(K, dtype=np.int64)
        crits = np.zeros((K, 3))
        newlens = np.zeros((K, 5))
        for s in range(0, K, chunk):
            e = min(s + chunk, K)
            n = e - s
            # fixed chunk shape: one compilation for every batch size
            m = chunk
            rpad = np.zeros((m, 4), dtype=np.int64)
            lpad = np.full((m, 5), 0.1, dtype=self.dtype)
            rpad[:n] = rows[s:e]
            lpad[:n] = lengths[s:e]
            valid = np.zeros(m, dtype=np.float32)
            valid[:n] = 1.0
            ch, cr, nl, self._rough_acc, self._exact_acc = _quartet_nni_rows(
                self.codes, self.W, self.V, jnp.asarray(rpad), jnp.asarray(lpad),
                jnp.asarray(valid),
                self.rates, self.ratecat, self.eigenval, self.code_freq,
                self.statinv, self.eigeninv, self.pos_mask, self.min_rel_len,
                self.min_len, self.tol,
                self.dtype(opts.ml_ftol_branch_length),
                self.dtype(opts.ml_min_branch_length_tolerance), self.jc,
                self.use_approx, self.near_p, self.near_freq,
                self._rough_acc, self._exact_acc)
            choices[s:e] = np.asarray(ch)[:n]
            crits[s:e] = np.asarray(cr)[:n]
            newlens[s:e] = np.asarray(nl)[:n]
            self.nj.debug.n_lk_compute += 3 * 5 * 8 * n
            self.nj.debug.n_posterior_compute += 3 * 6 * n
        return choices, crits, newlens

    def quartet_split_rows(self, rows, lengths, chunk: int = 256):
        """Batched three-topology split test with per-site log-lks (device
        core of testSplitsML).  rows [K,4], lengths [K,5] ->
        (loglk [K,3], site [K,3,n_pos])."""
        from .. import constants
        opts = self.options
        K = len(rows)
        loglk = np.zeros((K, 3))
        site = np.zeros((K, 3, self.n_pos))
        acc_gt1 = bool(opts.ml_accuracy > 1)
        for s in range(0, K, chunk):
            e = min(s + chunk, K)
            n = e - s
            m = chunk
            rpad = np.zeros((m, 4), dtype=np.int64)
            lpad = np.full((m, 5), 0.1, dtype=self.dtype)
            rpad[:n] = rows[s:e]
            lpad[:n] = lengths[s:e]
            ll, st = _quartet_split_rows(
                self.codes, self.W, self.V, jnp.asarray(rpad),
                jnp.asarray(lpad),
                self.dtype(constants.CLOSE_LOGLK_LIMIT), acc_gt1,
                self.rates, self.ratecat, self.eigenval, self.code_freq,
                self.statinv, self.eigeninv, self.pos_mask, self.min_rel_len,
                self.min_len, self.tol,
                self.dtype(opts.ml_ftol_branch_length),
                self.dtype(opts.ml_min_branch_length_tolerance), self.jc,
                self.use_approx, self.near_p, self.near_freq)
            loglk[s:e] = np.asarray(ll, dtype=np.float64)[:n]
            site[s:e] = np.asarray(st, dtype=np.float64)[:n, :, : self.n_pos]
            self.nj.debug.n_lk_compute += 4 * 5 * 8 * n
        return loglk, site

    def posterior_into(self, target: int, r1: int, r2: int, len1: float,
                       len2: float) -> None:
        self.codes, self.W, self.V, self._rough_acc, self._exact_acc = \
            _pick(_posterior_into, self.store_bytes())(
                self.codes, self.W, self.V, target, r1, r2, self.dtype(len1),
                self.dtype(len2), self.rates, self.ratecat, self.eigenval,
                self.code_freq, self.statinv, self.eigeninv, self.min_rel_len,
                self.min_len, self.jc, self.tol, self.use_approx, self.near_p,
                self.near_freq, self._rough_acc, self._exact_acc)
        self.nj.debug.n_posterior_compute += 1

    def posterior_rows(self, targets, r1s, r2s, len1s, len2s) -> None:
        tp, n = _pad_pow2(np.asarray(targets, dtype=np.int64),
                          fill=self.scratch_row(S_TMP2))
        r1p, _ = _pad_pow2(np.asarray(r1s, dtype=np.int64))
        r2p, _ = _pad_pow2(np.asarray(r2s, dtype=np.int64))
        l1p = _pad_vals(len1s, n, len(tp), 0.1, self.dtype)
        l2p = _pad_vals(len2s, n, len(tp), 0.1, self.dtype)
        valid = np.zeros(len(tp), dtype=np.float32)
        valid[:n] = 1.0
        self.codes, self.W, self.V, self._rough_acc, self._exact_acc = \
            _pick(_posterior_rows, self.store_bytes())(
                self.codes, self.W, self.V, jnp.asarray(tp), jnp.asarray(r1p),
                jnp.asarray(r2p), l1p, l2p,
                jnp.asarray(valid), self.rates, self.ratecat, self.eigenval,
                self.code_freq, self.statinv, self.eigeninv, self.min_rel_len,
                self.min_len, self.jc, self.tol, self.use_approx, self.near_p,
                self.near_freq, self._rough_acc, self._exact_acc)
        self.nj.debug.n_posterior_compute += n

    def flush_posterior_counters(self) -> None:
        """Fetch the device-accumulated rough/exact posterior position counts
        into the debug counters (ref nAAPosteriorRough/Exact) -- ONE blocking
        fetch, called before the final stats print."""
        self.nj.debug.n_aa_posterior_rough += int(float(self._rough_acc))
        self.nj.debug.n_aa_posterior_exact += int(float(self._exact_acc))
        self._rough_acc = jnp.zeros((), jnp.float32)
        self._exact_acc = jnp.zeros((), jnp.float32)

    def recompute_average_profiles(self) -> None:
        """Balanced averaging of internal nodes in ML space; whole sweep in
        a few fused dispatches (ref recomputeProfiles(tmatAsDist))."""
        from .profiles import _level_runs
        tree = self.nj.tree
        levels = []
        for level in tree.level_lists():
            nodes = [int(nd) for nd in level if tree.n_child[nd] == 2]
            if not nodes:
                continue
            iis = np.array([int(tree.children[nd, 0]) for nd in nodes])
            jjs = np.array([int(tree.children[nd, 1]) for nd in nodes])
            levels.append((nodes, iis, jjs))
        for t, i, j in _level_runs(levels) if levels else []:
            self.codes, self.W, self.V = _pick(
                _ml_avg_sweep, self.store_bytes())(
                self.codes, self.W, self.V, jnp.asarray(t), jnp.asarray(i),
                jnp.asarray(j), self.code_freq, self.eigentot, self.gap_vec,
                self.jc, self.tol)

    def posterior_sweep(self, levels) -> None:
        """Dependency-ordered posterior level sweep: `levels` is a list of
        (targets, r1s, r2s, len1s, len2s); one donated dispatch per bucket
        run (see _posterior_sweep)."""
        from .profiles import _level_runs
        opts = self.options
        for t, r1, r2, l1, l2 in _level_runs(levels, n_float=2):
            (self.codes, self.W, self.V, self._rough_acc,
             self._exact_acc) = _pick(_posterior_sweep, self.store_bytes())(
                self.codes, self.W, self.V, jnp.asarray(t), jnp.asarray(r1),
                jnp.asarray(r2), jnp.asarray(l1, dtype=self.dtype),
                jnp.asarray(l2, dtype=self.dtype), self.rates, self.ratecat,
                self.eigenval, self.code_freq, self.statinv, self.eigeninv,
                self.min_rel_len, self.min_len, self.jc, self.tol,
                self.use_approx, self.near_p, self.near_freq,
                self._rough_acc, self._exact_acc)
            self.nj.debug.n_posterior_compute += int((t >= 0).sum())

    def recompute_ml_profiles(self) -> None:
        """Posterior recompute of all internal profiles bottom-up; whole
        sweep in a few fused dispatches (ref recomputeMLProfiles
        tcc:3516-3539)."""
        tree = self.nj.tree
        bl = tree.branchlength
        levels = []
        for level in tree.level_lists():
            nodes = [int(nd) for nd in level if tree.n_child[nd] == 2]
            if not nodes:
                continue
            iis = np.array([int(tree.children[nd, 0]) for nd in nodes])
            jjs = np.array([int(tree.children[nd, 1]) for nd in nodes])
            levels.append((nodes, iis, jjs, bl[iis], bl[jjs]))
        if levels:
            self.posterior_sweep(levels)


def _ml_avg_sweep_impl(codes, W, V, tbl_t, tbl_1, tbl_2, code_freq, eigentot,
                  gap_vec, jc, tol):
    """A RUN of tree levels' ML-space balanced averages in ONE donated
    dispatch (tables [L, K], -1 target pads drop; see _posterior_sweep for
    the dispatch-overhead rationale)."""
    n = V.shape[-1]

    def body(k, carry):
        codes, W, V = carry

        def one(c1, w1, v1, c2, w2, v2):
            c, w, _, f = kernels.average_profile(
                c1, w1, w1[..., None] * v1, c2, w2, w2[..., None] * v2, 0.5,
                code_freq[:n], None if jc else eigentot, tol)
            f = jnp.where(w[..., None] > 0, f, gap_vec)
            return c, w, f

        t = tbl_t[k]
        r1 = jnp.clip(tbl_1[k], 0, codes.shape[0] - 1)
        r2 = jnp.clip(tbl_2[k], 0, codes.shape[0] - 1)
        cs, ws, fs = jax.vmap(one)(codes[r1], W[r1], V[r1],
                                   codes[r2], W[r2], V[r2])
        tgt = jnp.where(t >= 0, t, codes.shape[0])
        codes = codes.at[tgt].set(cs, mode="drop")
        W = W.at[tgt].set(ws, mode="drop")
        V = V.at[tgt].set(fs, mode="drop")
        return codes, W, V

    return jax.lax.fori_loop(0, tbl_t.shape[0], body, (codes, W, V))


_ml_avg_sweep = _dual_jit(_ml_avg_sweep_impl, ("jc", "tol"), (0, 1, 2))


# ---------------------------------------------------------------------------
# Device-fused branch-length optimization: the full onedimenmin/Brent line
# search (ref tcc:7024-7178) runs in one compiled while_loop per call, with
# the profile gathers and effective-vector mixing hoisted out of the loop --
# each likelihood evaluation inside Brent is just exp + contract + log-sum.
# The control flow mirrors engine/ml.py's host brent() exactly (same constants,
# same update rules), so the optimization path is the same algorithm.
# ---------------------------------------------------------------------------

_CGOLD = 0.3819660
_ZEPS = 1.0e-10
_BRENT_ITMAX = 100


def _loglk_of_len(f1, f2, w1, w2, length, rates, ratecat, eigenval, pos_mask,
                  min_rel_len, jc):
    if jc:
        psame, pdiff = kernels.p_same_diff(length, rates)
        ll, _ = kernels.pair_loglk_jc(f1, f2, psame, pdiff, ratecat, pos_mask)
    else:
        ee = kernels.exp_eigen_rates(length, rates, eigenval, min_rel_len)
        ll, _ = kernels.pair_loglk_matrix(f1, f2, w1, w2, ee, ratecat, pos_mask)
    return ll


def _onedimenmin_device(neg, guess, xmin, xmax, ftol, atol):
    """Traced bracketing + Brent (ref tcc:7024-7178); `neg` is a traced closure."""
    # --- bracketing (ref onedimenmin tcc:7027-7074)
    ax, bx, cx = jax.lax.cond(
        guess == xmin,
        lambda: (xmin, 2.0 * guess, 10.0 * guess),
        lambda: jax.lax.cond(
            guess <= 2.0 * xmin,
            lambda: (xmin, guess, 5.0 * guess),
            lambda: (0.5 * guess, guess, 2.0 * guess)))
    cx = jnp.minimum(cx, xmax)
    bx = jnp.where(bx >= cx, 0.5 * (ax + cx), bx)
    fa = neg(ax)
    fb = neg(bx)
    fc = neg(cx)

    def shrink_lo(state):
        ax, fa = state
        ax = (ax + xmin) / 2.0
        ax = jnp.where(ax < 2.0 * xmin, xmin, ax)
        return ax, neg(ax)

    ax, fa = jax.lax.while_loop(lambda s: (s[1] < fb) & (s[0] > xmin),
                                lambda s: shrink_lo(s), (ax, fa))

    def grow_hi(state):
        cx, fc = state
        cx = (cx + xmax) / 2.0
        cx = jnp.where(cx > xmax * 0.95, xmax, cx)
        return cx, neg(cx)

    cx, fc = jax.lax.while_loop(lambda s: (s[1] < fb) & (s[0] < xmax),
                                lambda s: grow_hi(s), (cx, fc))

    # --- Brent (ref tcc:7098-7178)
    a = jnp.minimum(ax, cx)
    b = jnp.maximum(ax, cx)
    x, fx = bx, fb
    w_, fw, v_, fv = jax.lax.cond(fa < fc,
                                  lambda: (ax, fa, cx, fc),
                                  lambda: (cx, fc, ax, fa))

    def brent_cond(st):
        a, b, x, w_, v_, fx, fw, fv, d, e, it, done = st
        return (~done) & (it < _BRENT_ITMAX)

    def brent_body(st):
        a, b, x, w_, v_, fx, fw, fv, d, e, it, done = st
        xm = 0.5 * (a + b)
        tol1 = ftol * jnp.abs(x)
        tol2 = 2.0 * (tol1 + _ZEPS)
        finish = (jnp.abs(x - xm) <= (tol2 - 0.5 * (b - a))) | (jnp.abs(a - b) < atol)

        # parabolic step or golden section
        r = (x - w_) * (fx - fv)
        q = (x - v_) * (fx - fw)
        p = (x - v_) * q - (x - w_) * r
        q2 = 2.0 * (q - r)
        p = jnp.where(q2 > 0.0, -p, p)
        q2 = jnp.abs(q2)
        etemp = e
        use_golden = (jnp.abs(p) >= jnp.abs(0.5 * q2 * etemp)) \
            | (p <= q2 * (a - x)) | (p >= q2 * (b - x))
        e_gold = jnp.where(x >= xm, a - x, b - x)
        d_gold = _CGOLD * e_gold
        d_par = p / jnp.where(q2 == 0.0, 1.0, q2)
        u_par = x + d_par
        d_par = jnp.where((u_par - a < tol2) | (b - u_par < tol2),
                          jnp.where(xm - x >= 0, tol1, -tol1), d_par)
        small_e = jnp.abs(e) <= tol1
        d_new = jnp.where(small_e | use_golden, d_gold, d_par)
        e_new = jnp.where(small_e | use_golden, e_gold, d)

        u = jnp.where(jnp.abs(d_new) >= tol1, x + d_new,
                      x + jnp.where(d_new >= 0, tol1, -tol1))
        fu = neg(u)

        le = fu <= fx
        a2 = jnp.where(le, jnp.where(u >= x, x, a), jnp.where(u < x, u, a))
        b2 = jnp.where(le, jnp.where(u >= x, b, x), jnp.where(u < x, b, u))
        v2_ = jnp.where(le, w_, jnp.where((fu <= fw) | (w_ == x), w_,
                        jnp.where((fu <= fv) | (v_ == x) | (v_ == w_), u, v_)))
        fv2 = jnp.where(le, fw, jnp.where((fu <= fw) | (w_ == x), fw,
                        jnp.where((fu <= fv) | (v_ == x) | (v_ == w_), fu, fv)))
        w2_ = jnp.where(le, x, jnp.where((fu <= fw) | (w_ == x), u, w_))
        fw2 = jnp.where(le, fx, jnp.where((fu <= fw) | (w_ == x), fu, fw))
        x2 = jnp.where(le, u, x)
        fx2 = jnp.where(le, fu, fx)

        return jax.lax.cond(
            finish,
            lambda: (a, b, x, w_, v_, fx, fw, fv, d, e, it + 1, True),
            lambda: (a2, b2, x2, w2_, v2_, fx2, fw2, fv2, d_new, e_new,
                     it + 1, False))

    z = jnp.zeros((), x.dtype)
    st = (a, b, x, w_, v_, fx, fw, fv, z, z, jnp.int32(0), jnp.bool_(False))
    a, b, x, w_, v_, fx, fw, fv, d, e, it, done = jax.lax.while_loop(
        brent_cond, brent_body, st)
    return x, fx


def _opt_branch_len_core(codes, W, V, r1, r2, guess, xmin, xmax, ftol, atol,
                         rates, ratecat, eigenval, code_freq, pos_mask,
                         min_rel_len, jc):
    c1, w1, v1 = codes[r1], W[r1], V[r1]
    c2, w2, v2 = codes[r2], W[r2], V[r2]
    f1 = kernels.ml_effective(c1, w1, v1, code_freq, False, jc)
    f2 = kernels.ml_effective(c2, w2, v2, code_freq, False, jc)

    def neg(x):
        return -_loglk_of_len(f1, f2, w1, w2, x, rates, ratecat, eigenval,
                              pos_mask, min_rel_len, jc)

    return _onedimenmin_device(neg, guess, xmin, xmax, ftol, atol)


_opt_branch_len = functools.partial(jax.jit, static_argnames=("jc",))(
    _opt_branch_len_core)


@functools.partial(jax.jit, static_argnames=("jc",))
def _opt_branch_len_rows(codes, W, V, r1s, r2s, guesses, xmin, xmax, ftol, atol,
                         rates, ratecat, eigenval, code_freq, pos_mask,
                         min_rel_len, jc):
    f = jax.vmap(lambda r1, r2, g: _opt_branch_len_core(
        codes, W, V, r1, r2, g, xmin, xmax, ftol, atol, rates, ratecat,
        eigenval, code_freq, pos_mask, min_rel_len, jc))
    return f(r1s, r2s, guesses)


# ---------------------------------------------------------------------------
# Fully device-side ML quartet optimization (batched NNI mode).
#
# The serial path (engine/ml.py) reproduces the reference's star tests and
# multi-round re-optimization exactly; this device version performs one full
# 5-branch optimization per candidate topology (the core of MLQuartetOptimize,
# ref tcc:1650-1788) so a whole NNI round's quartets run as ONE vmapped
# dispatch.  Posterior temporaries live as traced values -- no scratch rows.
# Profiles are carried as (f_post, f_lk, w): the two effective-vector variants
# (posterior vs pairLogLk gap-mixing rules) plus weights.
# ---------------------------------------------------------------------------


def _p_from_row(codes, W, V, r, code_freq, jc):
    c, w, v = codes[r], W[r], V[r]
    return (kernels.ml_effective(c, w, v, code_freq, True, jc),
            kernels.ml_effective(c, w, v, code_freq, False, jc),
            w)


def _post_pair(p1, p2, l1, l2, rates, ratecat, eigenval, code_freq, statinv,
               eigeninv, min_rel_len, min_len, tol, jc, approx=None,
               counts=None):
    f1, _, w1 = p1
    f2, _, w2 = p2
    l1 = jnp.maximum(l1, min_len)
    l2 = jnp.maximum(l2, min_len)
    if jc:
        ps1, pd1 = kernels.p_same_diff(l1, rates)
        ps2, pd2 = kernels.p_same_diff(l2, rates)
        w_out, v_out = kernels.posterior_jc(f1, f2, w1, w2, ps1, pd1, ps2, pd2,
                                            ratecat)
        gap = jnp.full((v_out.shape[-1],), 0.25, dtype=v_out.dtype)
    else:
        ee1 = kernels.exp_eigen_rates(l1, rates, eigenval, min_rel_len)
        ee2 = kernels.exp_eigen_rates(l2, rates, eigenval, min_rel_len)
        n = f1.shape[-1]
        w_out, v_out, n_rough, n_exact = kernels.posterior_matrix(
            f1, f2, w1, w2, ee1, ee2, ratecat, code_freq[:n],
            eigeninv, statinv, tol, approx)
        gap = code_freq[127]
        if counts is not None:
            counts.append((n_rough, n_exact))
    v_out = jnp.where(w_out[..., None] > 0, v_out, gap)
    return (v_out, v_out, w_out)


def _ll_pair(p1, p2, length, rates, ratecat, eigenval, pos_mask, min_rel_len, jc):
    _, f1, w1 = p1
    _, f2, w2 = p2
    if jc:
        ps, pd = kernels.p_same_diff(length, rates)
        ll, _ = kernels.pair_loglk_jc(f1, f2, ps, pd, ratecat, pos_mask)
    else:
        ee = kernels.exp_eigen_rates(length, rates, eigenval, min_rel_len)
        ll, _ = kernels.pair_loglk_matrix(f1, f2, w1, w2, ee, ratecat, pos_mask)
    return ll


def _quartet_opt_device(pA, pB, pC, pD, len5, rates, ratecat, eigenval,
                        code_freq, statinv, eigeninv, pos_mask, min_rel_len,
                        min_len, tol, ftol, atol, jc, approx=None, counts=None):
    """One full 5-branch quartet optimization; returns (loglk, new_len5)."""
    lens = jnp.maximum(len5, min_len)
    la, lb, lc, ld, li = lens[0], lens[1], lens[2], lens[3], lens[4]

    def post(p1, p2, l1, l2):
        return _post_pair(p1, p2, l1, l2, rates, ratecat, eigenval, code_freq,
                          statinv, eigeninv, min_rel_len, min_len, tol, jc,
                          approx, counts)

    def ll(p1, p2, length):
        return _ll_pair(p1, p2, length, rates, ratecat, eigenval, pos_mask,
                        min_rel_len, jc)

    def opt(p1, p2, guess):
        return _onedimenmin_device(lambda x: -ll(p1, p2, x), guess, min_len,
                                   jnp.asarray(6.0, dtype=guess.dtype), ftol, atol)

    ab = post(pA, pB, la, lb)
    cd = post(pC, pD, lc, ld)
    li, neg = opt(ab, cd, li)
    bcd = post(pB, cd, lb, li)
    la, neg = opt(pA, bcd, la)
    acd = post(pA, cd, la, li)
    lb, neg = opt(pB, acd, lb)
    ab = post(pA, pB, la, lb)
    abd = post(ab, pD, li, ld)
    lc, neg = opt(pC, abd, lc)
    abc = post(ab, pC, li, lc)
    ld, neg = opt(pD, abc, ld)
    loglk = -neg + ll(ab, pC, li + lc) + ll(pA, pB, la + lb)
    return loglk, jnp.stack([la, lb, lc, ld, li])


def _ll_pair_site(p1, p2, length, rates, ratecat, eigenval, pos_mask,
                  min_rel_len, jc):
    """(loglk, per-site LOG lk masked to real positions)."""
    _, f1, w1 = p1
    _, f2, w2 = p2
    if jc:
        ps, pd = kernels.p_same_diff(length, rates)
        ll, lk = kernels.pair_loglk_jc(f1, f2, ps, pd, ratecat, pos_mask)
    else:
        ee = kernels.exp_eigen_rates(length, rates, eigenval, min_rel_len)
        ll, lk = kernels.pair_loglk_matrix(f1, f2, w1, w2, ee, ratecat,
                                           pos_mask)
    site = jnp.where(pos_mask, jnp.log(jnp.maximum(lk, 1e-300)), 0.0)
    return ll, site


def _quartet_opt_site(pA, pB, pC, pD, len5, rates, ratecat, eigenval,
                      code_freq, statinv, eigeninv, pos_mask, min_rel_len,
                      min_len, tol, ftol, atol, jc, approx=None):
    """_quartet_opt_device + per-site log-lks of the optimized quartet
    (host ml_quartet_optimize want_site_lk=True, ref tcc:1650-1788)."""
    lens = jnp.maximum(len5, min_len)
    la, lb, lc, ld, li = lens[0], lens[1], lens[2], lens[3], lens[4]

    def post(p1, p2, l1, l2):
        return _post_pair(p1, p2, l1, l2, rates, ratecat, eigenval, code_freq,
                          statinv, eigeninv, min_rel_len, min_len, tol, jc,
                          approx)

    def ll(p1, p2, length):
        return _ll_pair(p1, p2, length, rates, ratecat, eigenval, pos_mask,
                        min_rel_len, jc)

    def opt(p1, p2, guess):
        return _onedimenmin_device(lambda x: -ll(p1, p2, x), guess, min_len,
                                   jnp.asarray(6.0, dtype=guess.dtype), ftol,
                                   atol)

    ab = post(pA, pB, la, lb)
    cd = post(pC, pD, lc, ld)
    li, neg = opt(ab, cd, li)
    bcd = post(pB, cd, lb, li)
    la, neg = opt(pA, bcd, la)
    acd = post(pA, cd, la, li)
    lb, neg = opt(pB, acd, lb)
    ab = post(pA, pB, la, lb)
    abd = post(ab, pD, li, ld)
    lc, neg = opt(pC, abd, lc)
    abc = post(ab, pC, li, lc)
    ld, neg = opt(pD, abc, ld)
    _, s1 = _ll_pair_site(abc, pD, ld, rates, ratecat, eigenval, pos_mask,
                          min_rel_len, jc)
    ll2, s2 = _ll_pair_site(ab, pC, li + lc, rates, ratecat, eigenval,
                            pos_mask, min_rel_len, jc)
    ll3, s3 = _ll_pair_site(pA, pB, la + lb, rates, ratecat, eigenval,
                            pos_mask, min_rel_len, jc)
    loglk = -neg + ll2 + ll3
    return loglk, s1 + s2 + s3, jnp.stack([la, lb, lc, ld, li])


def _quartet_split_core(codes, W, V, rows4, len5, close_lim, acc_gt1, rates,
                        ratecat, eigenval, code_freq, statinv, eigeninv,
                        pos_mask, min_rel_len, min_len, tol, ftol, atol, jc,
                        approx=None):
    """One split's three-topology log-lks + per-site log-lks (the device
    core of testSplitsML, ref tcc:6856-6999): AB|CD at current lengths,
    AC|BD and AD|BC fully optimized, with the reference's second
    re-optimization pass on the closer alternative."""
    pA = _p_from_row(codes, W, V, rows4[0], code_freq, jc)
    pB = _p_from_row(codes, W, V, rows4[1], code_freq, jc)
    pC = _p_from_row(codes, W, V, rows4[2], code_freq, jc)
    pD = _p_from_row(codes, W, V, rows4[3], code_freq, jc)
    lens = jnp.maximum(len5, min_len)
    la, lb, lc, ld, li = lens[0], lens[1], lens[2], lens[3], lens[4]
    args = (rates, ratecat, eigenval, code_freq, statinv, eigeninv, pos_mask,
            min_rel_len, min_len, tol, ftol, atol, jc, approx)

    # ABvsCD: quartet log-lk at CURRENT lengths (ref MLQuartetLogLk :5410)
    ab = _post_pair(pA, pB, la, lb, rates, ratecat, eigenval, code_freq,
                    statinv, eigeninv, min_rel_len, min_len, tol, jc, approx)
    cd = _post_pair(pC, pD, lc, ld, rates, ratecat, eigenval, code_freq,
                    statinv, eigeninv, min_rel_len, min_len, tol, jc, approx)
    ll1, s1 = _ll_pair_site(pA, pB, la + lb, rates, ratecat, eigenval,
                            pos_mask, min_rel_len, jc)
    ll2, s2 = _ll_pair_site(pC, pD, lc + ld, rates, ratecat, eigenval,
                            pos_mask, min_rel_len, jc)
    ll3, s3 = _ll_pair_site(ab, cd, li, rates, ratecat, eigenval,
                            pos_mask, min_rel_len, jc)
    ll_ab = ll1 + ll2 + ll3
    site_ab = s1 + s2 + s3

    l_ac = jnp.stack([len5[0], len5[2], len5[1], len5[3], len5[4]])
    l_ad = jnp.stack([len5[0], len5[3], len5[2], len5[1], len5[4]])
    ll_ac, site_ac, n_ac = _quartet_opt_site(pA, pC, pB, pD, l_ac, *args)
    ll_ad, site_ad, n_ad = _quartet_opt_site(pA, pD, pC, pB, l_ad, *args)
    # second pass on the closer alternative (ref :6932-6945); both are
    # computed (uniform vmapped cost) and selected by the host rule
    redo_ac = (ll_ac > ll_ad) & (acc_gt1 | (ll_ac > ll_ab - close_lim))
    redo_ad = (~(ll_ac > ll_ad)) & (acc_gt1 | (ll_ad > ll_ab - close_lim))
    ll_ac2, site_ac2, _ = _quartet_opt_site(pA, pC, pB, pD, n_ac, *args)
    ll_ad2, site_ad2, _ = _quartet_opt_site(pA, pD, pC, pB, n_ad, *args)
    ll_ac = jnp.where(redo_ac, ll_ac2, ll_ac)
    site_ac = jnp.where(redo_ac, site_ac2, site_ac)
    ll_ad = jnp.where(redo_ad, ll_ad2, ll_ad)
    site_ad = jnp.where(redo_ad, site_ad2, site_ad)
    return (jnp.stack([ll_ab, ll_ac, ll_ad]),
            jnp.stack([site_ab, site_ac, site_ad]))


@functools.partial(jax.jit, static_argnames=("jc", "use_approx"))
def _quartet_split_rows(codes, W, V, rows, lens, close_lim, acc_gt1, rates,
                        ratecat, eigenval, code_freq, statinv, eigeninv,
                        pos_mask, min_rel_len, min_len, tol, ftol, atol, jc,
                        use_approx, near_p, near_freq):
    approx = _approx_tuple(use_approx, near_p, near_freq)
    f = jax.vmap(lambda r4, l5: _quartet_split_core(
        codes, W, V, r4, l5, close_lim, acc_gt1, rates, ratecat, eigenval,
        code_freq, statinv, eigeninv, pos_mask, min_rel_len, min_len, tol,
        ftol, atol, jc, approx))
    return f(rows, lens)


def _quartet_nni_core(codes, W, V, rows4, len5, rates, ratecat, eigenval,
                      code_freq, statinv, eigeninv, pos_mask, min_rel_len,
                      min_len, tol, ftol, atol, jc, approx=None):
    pA = _p_from_row(codes, W, V, rows4[0], code_freq, jc)
    pB = _p_from_row(codes, W, V, rows4[1], code_freq, jc)
    pC = _p_from_row(codes, W, V, rows4[2], code_freq, jc)
    pD = _p_from_row(codes, W, V, rows4[3], code_freq, jc)
    counts = []
    args = (rates, ratecat, eigenval, code_freq, statinv, eigeninv, pos_mask,
            min_rel_len, min_len, tol, ftol, atol, jc, approx, counts)
    l_ab = len5
    l_ac = jnp.stack([len5[0], len5[2], len5[1], len5[3], len5[4]])
    l_ad = jnp.stack([len5[0], len5[3], len5[2], len5[1], len5[4]])
    ll_ab, n_ab = _quartet_opt_device(pA, pB, pC, pD, l_ab, *args)
    ll_ac, n_ac = _quartet_opt_device(pA, pC, pB, pD, l_ac, *args)
    ll_ad, n_ad = _quartet_opt_device(pA, pD, pC, pB, l_ad, *args)
    crit = jnp.stack([ll_ab, ll_ac, ll_ad])
    pick_ac = (ll_ac > ll_ab) & (ll_ac > ll_ad)
    pick_ad = (ll_ad > ll_ab) & (ll_ad > ll_ac) & ~pick_ac
    choice = jnp.where(pick_ac, 1, jnp.where(pick_ad, 2, 0))
    newlen = jnp.where(pick_ac, n_ac, jnp.where(pick_ad, n_ad, n_ab))
    if counts:
        n_rough = sum(c[0] for c in counts)
        n_exact = sum(c[1] for c in counts)
    else:
        n_rough = n_exact = jnp.zeros((), jnp.float32)
    return choice, crit, newlen, n_rough, n_exact


@functools.partial(jax.jit, static_argnames=("jc", "use_approx"))
def _quartet_nni_rows(codes, W, V, rows, lens, valid, rates, ratecat, eigenval,
                      code_freq, statinv, eigeninv, pos_mask, min_rel_len,
                      min_len, tol, ftol, atol, jc, use_approx, near_p,
                      near_freq, rough_acc, exact_acc):
    approx = _approx_tuple(use_approx, near_p, near_freq)
    f = jax.vmap(lambda r4, l5: _quartet_nni_core(
        codes, W, V, r4, l5, rates, ratecat, eigenval, code_freq, statinv,
        eigeninv, pos_mask, min_rel_len, min_len, tol, ftol, atol, jc, approx))
    ch, cr, nl, n_roughs, n_exacts = f(rows, lens)
    return (ch, cr, nl, rough_acc + (n_roughs * valid).sum(),
            exact_acc + (n_exacts * valid).sum())
