"""Device compute kernels for the profile-NJ engine (jnp / XLA / Pallas).

TPU-native re-design of the reference's 10-op SIMD kernel layer
(ref src/operations/BasicOperations.h:20-39) plus the position loops that call
it (profileDist ref NeighbourJoining.tcc:1167-1190, posteriorProfile
:2137-2447, pairLogLk :1192-1447, averageProfile :2063-2135, outProfile
:729-815).  Instead of translating the per-position scalar loops, each phase is
expressed as a batched tensor contraction over the whole alignment:

* ME profile distance: profiles are stored as *weighted rotated* frequency
  tensors U[node, P, C] = W[node, P, None] * V (one-hot / eigen-rotated), so a
  one-vs-many distance scan collapses to a single [M, P*C] x [P*C] matvec on
  the MXU, and the "sparse" code fast paths of the reference (seqDist,
  codeDist) become exactly equal dense contractions -- verified identities:
      code-vs-code piece  = codeFreq[c1] . (eigenval * codeFreq[c2])
                          = distances[c1][c2]
      %different piece    = 1 - onehot(c1) . onehot(c2)
* posterior profiles: three [P, C] x [C, C] matmuls per node pair (rotate to
  character space, pointwise product with 1/stat, rotate back), batched over
  positions and (later) over independent quartets.
* pairLogLk: sum over positions of log(r1 . (expeigen * r2)) with per-position
  rate categories; underflow rescaling of the reference is replaced by direct
  log-space summation (numerically stronger, equal within tolerance).

All functions are pure and jit-friendly; position axes are padded to a lane
multiple with weight-0 padding so every reduction is exact.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..constants import NOCODE

# ---------------------------------------------------------------------------
# ME-space distance scans
# ---------------------------------------------------------------------------


def me_dist_many(U, W, u_q, w_q, eigenval):
    """Distance of one query profile against many profiles.

    U:[M,P,C], W:[M,P] weighted rotated profiles; u_q:[P,C], w_q:[P] query.
    eigenval: [C] for matrix (eigen-rotated) mode, or None for %different mode.

    Returns (dist[M], denom[M]) with the reference conventions
    (ref profileDist NeighbourJoining.tcc:1167-1190):
      denom = sum_p w1 w2 ; dist = top/denom, or 1 when denom == 0.
    """
    M = U.shape[0]
    denom = W @ w_q  # [M]
    if eigenval is not None:
        a = (u_q * eigenval[None, :]).reshape(-1)  # [P*C]
        top = U.reshape(M, -1) @ a
    else:
        top = denom - U.reshape(M, -1) @ u_q.reshape(-1)
    dist = jnp.where(denom > 0, top / jnp.where(denom > 0, denom, 1.0), 1.0)
    return dist, denom


def me_dist_many_2d(U2, W, u_q, w_q, eigenval):
    """me_dist_many against a PRE-FLATTENED store U2 [M, P*C].

    Same dot shapes as me_dist_many's reshape+matmul (bit-identical per-row
    reduction); the 2D operand exists so the device join epoch can keep the
    whole store in a matmul-native layout -- reshaping the 3D store inside
    the epoch would materialize a transpose copy in the C-minor tiled
    layout, a 32x-padded allocation (14.7 GB at N=20000)."""
    denom = W @ w_q
    if eigenval is not None:
        a = (u_q * eigenval[None, :]).reshape(-1)
        top = U2 @ a
    else:
        top = denom - U2 @ u_q.reshape(-1)
    dist = jnp.where(denom > 0, top / jnp.where(denom > 0, denom, 1.0), 1.0)
    return dist, denom


def me_dist_pair(u1, w1, u2, w2, eigenval):
    d, w = me_dist_many(u1[None], w1[None], u2, w2, eigenval)
    return d[0], w[0]


def me_dist_rows(U1, W1, U2, W2, eigenval):
    """Row-wise distances between two stacks of profiles: [K,P,C] x [K,P,C] -> [K]."""
    K = U1.shape[0]
    denom = jnp.einsum("kp,kp->k", W1, W2)
    dots = jnp.einsum("kx,kx->k", U1.reshape(K, -1), U2.reshape(K, -1))
    if eigenval is not None:
        dots = jnp.einsum("kpc,kpc,c->k", U1, U2, eigenval)
        top = dots
    else:
        top = denom - dots
    dist = jnp.where(denom > 0, top / jnp.where(denom > 0, denom, 1.0), 1.0)
    return dist, denom


def log_correct(dist, n_codes, use_matrix):
    """Log-correction of raw distances (ref logCorrect NeighbourJoining.tcc:322-330).

    Jukes-Cantor for nucleotides without a matrix, scoredist-like otherwise.
    """
    maxscore = 3.0
    if n_codes == 4 and not use_matrix:
        corr = jnp.where(dist < 0.74, -0.75 * jnp.log1p(-jnp.minimum(dist, 0.7399) * 4.0 / 3.0),
                         maxscore)
    else:
        corr = jnp.where(dist < 0.99, -1.3 * jnp.log1p(-jnp.minimum(dist, 0.9899)), maxscore)
    return jnp.minimum(corr, maxscore)


# ---------------------------------------------------------------------------
# Profile construction / averaging (ME space)
# ---------------------------------------------------------------------------


def normalize_freq(vec, eigentot, fallback, tol):
    """Normalize per-position frequency vectors to total (unrotated) frequency 1.

    vec: [..., C].  eigentot: [C] rotation of all-ones (matrix mode) or None
    (plain mode, total = sum).  Positions with total <= tol get `fallback`
    (ref normalizeFreq NeighbourJoining.tcc:839-871).
    """
    if eigentot is not None:
        total = vec @ eigentot
    else:
        total = vec.sum(axis=-1)
    ok = total > tol
    scaled = vec / jnp.where(ok, total, 1.0)[..., None]
    return jnp.where(ok[..., None], scaled, jnp.broadcast_to(fallback, vec.shape))


def average_profile(c1, w1, u1, c2, w2, u2, bionj_weight, code_freq, eigentot, tol):
    """Weighted merge of two profiles for a join (ref averageProfile tcc:2063-2135).

    Inputs/outputs use the weighted-rotated representation U = w * f.
    code_freq: [nCodes, C] rotated one-hots (or identity one-hots in plain
    mode); eigentot None in plain mode.  Returns (codes, w, U).
    """
    bw = bionj_weight
    w_out = bw * w1 + (1.0 - bw) * w2

    # out code: keep child's code if they agree or the other child is absent
    # (ref tcc:2077-2089); otherwise NOCODE (a "stored vector" position).
    c_out = jnp.full_like(c1, NOCODE)
    take1 = (w1 > 0) & (c1 != NOCODE) & ((w2 <= 0) | (c1 == c2))
    take2 = (w1 <= 0) & (w2 > 0) & (c2 != NOCODE)
    c_out = jnp.where(take1, c1, jnp.where(take2, c2, c_out))
    c_out = jnp.where(w_out > 0, c_out, NOCODE)

    accum = bw * u1 + (1.0 - bw) * u2  # sum of w_i * weight_i * f_i
    nCodes = code_freq.shape[0]
    fallback = code_freq[0] if eigentot is not None else jnp.full(
        (code_freq.shape[1],), 1.0 / nCodes, dtype=u1.dtype)
    f_out = normalize_freq(accum, eigentot, fallback, tol)
    # coded positions are implicitly exactly the rotated one-hot
    coded = (c_out != NOCODE) & (w_out > 0)
    safe_c = jnp.where(c_out == NOCODE, 0, c_out).astype(jnp.int32)
    f_out = jnp.where(coded[..., None], code_freq[safe_c], f_out)
    u_out = jnp.where(w_out[..., None] > 0, w_out[..., None] * f_out, 0.0)
    return c_out, w_out, u_out, f_out


def out_profile(U, W, active_mask, code_freq, eigentot, tol):
    """Average profile of all active nodes (ref outProfile tcc:729-815).

    Returns (w_out[P], f_out[P,C]) -- note f_out is the *unweighted* normalized
    frequency (the out-profile stores frequencies; its weight is the average of
    input weights, floored at 1e-20 so a vector always exists).
    """
    n = active_mask.sum()
    m = active_mask.astype(U.dtype)
    w_out = jnp.einsum("m,mp->p", m, W) / jnp.maximum(n, 1)
    w_out = jnp.maximum(w_out, 1e-20)
    accum = jnp.einsum("m,mpc->pc", m, U)
    nCodes = code_freq.shape[0]
    fallback = code_freq[0] if eigentot is not None else jnp.full(
        (code_freq.shape[1],), 1.0 / nCodes, dtype=U.dtype)
    f_out = normalize_freq(accum, eigentot, fallback, tol)
    return w_out, f_out


def update_out_profile(w_out, f_out, u_old1, w_old1, u_old2, w_old2, u_new, w_new,
                       n_active_old, code_freq, eigentot, tol):
    """Incremental out-profile update after a join (ref updateOutProfile tcc:943-1010)."""
    original_mult = w_out * n_active_old
    new_mult = original_mult + w_new - w_old1 - w_old2
    w2 = jnp.maximum(new_mult / (n_active_old - 1), 1e-20)
    accum = f_out * original_mult[..., None] - u_old1 - u_old2 + u_new
    nCodes = code_freq.shape[0]
    fallback = code_freq[0] if eigentot is not None else jnp.full(
        (code_freq.shape[1],), 1.0 / nCodes, dtype=f_out.dtype)
    f2 = normalize_freq(accum, eigentot, fallback, tol)
    return w2, f2


def out_distance_from_hit(dist, weight, selfdist, selfweight, diameter, totdiam, n_active):
    """outDistance from d(node, outprofile) (ref setOutDistance tcc:1012-1083)."""
    top = (n_active - 1) * (dist * weight * n_active - selfweight * selfdist)
    bottom = weight * n_active - selfweight
    pdist = top / jnp.where(bottom > 0.01, bottom, 1.0)
    return jnp.where(bottom > 0.01,
                     pdist - diameter * (n_active - 1) - (totdiam - diameter),
                     3.0)


# ---------------------------------------------------------------------------
# ML-space: effective vectors, pair log-likelihood, posterior profiles
# ---------------------------------------------------------------------------


def ml_effective(codes, w, v, code_freq, for_posterior, jukes_cantor):
    """Effective per-position frequency vector under the reference's mixing rules.

    v holds raw (unmixed) vectors; coded positions hold codeFreq[code] (or the
    gap row for w==0).  The reference mixes partially-weighted positions with
    the gap distribution:
      - matrix pairLogLk mixes every position with 0<w<1 (ref tcc:1288-1301),
      - matrix posteriorProfile mixes only code-derived (unstored) positions
        (ref tcc:2281-2299),
      - Jukes-Cantor mixes only code-derived positions in both uses
        (ref tcc:1235-1251, 2231-2247).
    """
    gap = code_freq[NOCODE] if not jukes_cantor else jnp.full(
        (v.shape[-1],), 0.25, dtype=v.dtype)
    stored = (codes == NOCODE) & (w > 0)
    frac = (w > 0) & (w < 1)
    if jukes_cantor or for_posterior:
        mix = frac & ~stored
    else:
        mix = frac
    wm = jnp.where(mix, w, 1.0)[..., None]
    return wm * v + (1.0 - wm) * gap


def pair_loglk_matrix(f1, f2, w1, w2, expeigen, ratecat, pos_mask):
    """Matrix-model pair log-likelihood (ref pairLogLk tcc:1267-1439).

    f1,f2: [P,C] effective rotated vectors; expeigen: [nRate,C]; ratecat: [P];
    pos_mask: [P] bool (False for padding).  Both-gap positions contribute 1
    (ref skips them), handled via the w1==0 & w2==0 mask.
    """
    ee = expeigen[ratecat]  # [P,C]
    lk = jnp.einsum("pc,pc,pc->p", f1, f2, ee)
    both_gap = (w1 == 0) & (w2 == 0)
    lk = jnp.where(both_gap | ~pos_mask, 1.0, lk)
    return jnp.sum(jnp.log(jnp.maximum(lk, 1e-37))), lk


def pair_loglk_jc(f1, f2, psame, pdiff, ratecat, pos_mask):
    """Jukes-Cantor pair log-likelihood (ref pairLogLk tcc:1202-1266).

    lkAB = sum_j f2[j] (f1[j] pSame + (1-f1[j]) pDiff)
         = pDiff + (pSame-pDiff) * f1.f2   (f2 sums to 1).
    """
    ps = psame[ratecat]
    pd = pdiff[ratecat]
    dot = jnp.einsum("pc,pc->p", f1, f2)
    sum2 = f2.sum(axis=-1)
    lk = pd * sum2 + (ps - pd) * dot
    lk = jnp.where(pos_mask, lk, 1.0)
    return jnp.sum(jnp.log(jnp.maximum(lk, 1e-37))), lk


def posterior_matrix(f1, f2, w1, w2, expeigen1, expeigen2, ratecat,
                     code_freq_n, eigeninv, statinv, tol, approx=None):
    """Posterior profile of a parent from two children, matrix model
    (ref posteriorProfile tcc:2262-2429).

    f1,f2: [P,C] effective rotated child vectors; expeigen*: [nRate,C].
    Returns (w_out[P], v_out[P,C], n_rough, n_exact) in rotated space;
    gap-gap positions get weight 0 and the gap row (caller substitutes
    code_freq[NOCODE]).

    approx: None for the exact path, else (near_p[C,C], near_freq[C,C],
    minf, minratio) enabling the -approxml rough-posterior gate (ref
    tcc:2390-2421): if one character dominates the normalized posterior
    (fPost[ch] >= approxMLminf) and the mixture w*onehot + (1-w)*nearP[ch]
    under-estimates no other character by more than approxMLminratio, the
    output is the precomputed rotation w*statinv[ch]*codeFreq[ch] +
    (1-w)*nearFreq[ch] -- skipping the eigeninv rotation for that position.
    n_rough/n_exact count non-gap positions taking each branch (ref debug
    counters nAAPosteriorRough/Exact); both are 0 on the exact path.
    """
    e1 = expeigen1[ratecat]
    e2 = expeigen2[ratecat]
    m1 = f1 * e1
    m2 = f2 * e2
    # rotate to character space: x[p,j] = codeFreq[j] . m[p]
    x1 = m1 @ code_freq_n.T
    x2 = m2 @ code_freq_n.T
    fpost = jnp.maximum(x1 * x2 * statinv[None, :], 0.0)
    tot = fpost.sum(axis=-1)
    ok = tot > tol
    fpost = fpost / jnp.where(ok, tot, 1.0)[..., None]
    both_gap = (w1 == 0) & (w2 == 0)
    w_out = jnp.where(both_gap, 0.0, 1.0)
    zero = jnp.zeros((), jnp.float32)
    if approx is None:
        # rotate back: out[p,k] = sum_j fpost[p,j] eigeninv[k,j]
        v_out = fpost @ eigeninv.T
        # nAAPosteriorExact counts every processed AA position even with
        # exactML on (ref tcc:2424); the nt matrix path has no such counter
        n_exact = (jnp.sum((~both_gap).astype(jnp.float32))
                   if fpost.shape[-1] == 20 else zero)
        return w_out, v_out, zero, n_exact
    near_p, near_freq, minf, minratio = approx
    # fPost sums to 1 and minf > 0.5, so "first j with fPost[j] >= minf"
    # (ref tcc:2392-2398) is equivalent to the argmax when it qualifies.
    ch = jnp.argmax(fpost, axis=-1)
    fmax = jnp.take_along_axis(fpost, ch[:, None], axis=-1)[:, 0]
    npch = near_p[ch]                       # [P, C]
    npdiag = jnp.take_along_axis(npch, ch[:, None], axis=-1)[:, 0]
    w = (fmax - npdiag) / (1.0 - npdiag)
    frough = (1.0 - w)[:, None] * npch
    onehot = jax.nn.one_hot(ch, fpost.shape[-1], dtype=jnp.bool_)
    under = (frough < fpost * minratio) & ~onehot
    rough = (fmax >= minf) & ~jnp.any(under, axis=-1)
    v_exact = fpost @ eigeninv.T
    w_invstat = w * statinv[ch]
    v_rough = w_invstat[:, None] * code_freq_n[ch] + (1.0 - w)[:, None] * near_freq[ch]
    v_out = jnp.where(rough[:, None], v_rough, v_exact)
    live = ~both_gap
    n_rough = jnp.sum((rough & live).astype(jnp.float32))
    n_exact = jnp.sum((~rough & live).astype(jnp.float32))
    return w_out, v_out, n_rough, n_exact


def posterior_jc(f1, f2, w1, w2, psame1, pdiff1, psame2, pdiff2, ratecat):
    """Posterior profile, Jukes-Cantor (ref posteriorProfile tcc:2164-2261).

    f[j] = (f1[j] pS1 + (1-f1[j]) pD1) * (f2[j] pS2 + (1-f2[j]) pD2), then
    normalized; the reference's sparse "simple profile" storage is an exactly
    equal re-encoding of this dense vector (the 1e-6 weight clamp for
    uninformative agreeing positions is not reproduced).
    """
    ps1, pd1 = psame1[ratecat][:, None], pdiff1[ratecat][:, None]
    ps2, pd2 = psame2[ratecat][:, None], pdiff2[ratecat][:, None]
    t1 = f1 * ps1 + (1.0 - f1) * pd1
    t2 = f2 * ps2 + (1.0 - f2) * pd2
    f = t1 * t2
    tot = f.sum(axis=-1, keepdims=True)
    f = f / jnp.maximum(tot, 1e-37)
    both_gap = (w1 == 0) & (w2 == 0)
    w_out = jnp.where(both_gap, 0.0, 1.0)
    f = jnp.where(both_gap[..., None], 0.25, f)
    return w_out, f


def exp_eigen_rates(length, rates, eigenval, min_rel_len):
    """expeigen[iRate, j] = exp(max(length*rate, minRel) * eigenval[j])
    (ref expEigenRates tcc:2020-2038)."""
    rel = jnp.maximum(length * rates, min_rel_len)
    return jnp.exp(rel[:, None] * eigenval[None, :])


def p_same_diff(length, rates):
    """JC probability of no change per rate category (ref pSameVector tcc:2005-2018)."""
    psame = 0.25 + 0.75 * jnp.exp((-4.0 / 3.0) * jnp.abs(length * rates))
    pdiff = (1.0 - psame) / 3.0
    return psame, pdiff


# ---------------------------------------------------------------------------
# Two-tier profile support: leaves live as int8 codes only (the reference's
# leaf fast path, ref seqDist tcc:1601-1624 / sparse Profile encoding); their
# one-hot/rotated vectors are expanded on the fly, never stored in HBM.
# HBM traffic for leaf scans drops ~16x (1 byte/position vs C floats).
# ---------------------------------------------------------------------------


def leaf_u(codes_rows, code_freq, dtype):
    """Expand leaf code rows [K, P] -> (U [K, P, C], W [K, P]).

    U = weight * rotated one-hot; gap (NOCODE) positions get weight 0."""
    from ..constants import NOCODE as _NOCODE
    valid = codes_rows != _NOCODE
    safe = jnp.where(valid, codes_rows, 0).astype(jnp.int32)
    W = valid.astype(dtype)
    U = code_freq[safe] * W[..., None]
    return U, W


def me_dist_many_codes(leaf_codes, uq, wq, eigenval, code_freq, dtype):
    """One query vs many code-only leaves, without materializing leaf vectors
    in HBM: piece sums become per-position gathers from the projected query.

      matrix:  top[l] = sum_p w_l,p * (uq_p . (eigenval*codeFreq[c_l,p]))
                      = sum_p w_l,p * G[p, c_l,p],  G = (uq * eigenval) @ codeFreq^T
      plain:   top[l] = denom[l] - sum_p w_l,p * uq[p, c_l,p]
    """
    from ..constants import NOCODE as _NOCODE
    valid = leaf_codes != _NOCODE
    safe = jnp.where(valid, leaf_codes, 0).astype(jnp.int32)
    wl = valid.astype(dtype)
    denom = wl @ wq
    if eigenval is not None:
        G = (uq * eigenval[None, :]) @ code_freq.T      # [P, nCodes]
    else:
        G = uq                                           # one-hot table = identity
    # gather-free per-position pick: C masked passes over [L, P] (VPU-friendly)
    # (picked already carries the query's weight through uq = wq * fq, so the
    # position sum must NOT multiply by wq again)
    picked = jnp.zeros(leaf_codes.shape, dtype=dtype)
    for c in range(G.shape[1]):
        picked = picked + jnp.where(safe == c, G[:, c][None, :], 0.0)
    contrib = jnp.einsum("lp->l", picked * wl)
    if eigenval is not None:
        top = contrib
    else:
        top = denom - contrib
    dist = jnp.where(denom > 0, top / jnp.where(denom > 0, denom, 1.0), 1.0)
    return dist, denom
