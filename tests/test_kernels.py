"""Unit tests: kernels vs straightforward numpy re-computation."""
import numpy as np
import pytest

import jax.numpy as jnp

from veryfasttree_tpu.ops import kernels
from veryfasttree_tpu.models.distance_matrix import DistanceMatrix
from veryfasttree_tpu.models.transition_matrix import TransitionMatrix


def test_blosum45_eigen_roundtrip():
    dm = DistanceMatrix.blosum45()
    recon = (dm.eigeninv * dm.eigenval[:, None]).T @ dm.eigeninv
    assert np.allclose(recon, dm.distances, atol=1e-8)
    # code_freq identity: codeFreq[c1].(eigenval*codeFreq[c2]) == distances
    got = np.einsum("ik,jk,k->ij", dm.code_freq, dm.code_freq, dm.eigenval)
    assert np.allclose(got, dm.distances, atol=1e-8)


def test_transition_matrix_reconstruction():
    tm = TransitionMatrix.jtt92()
    # V L V^-1 must reproduce M with column sums 0 and M.stat = 0
    V = tm.code_freq[:20].T  # V[i][k] = code_freq[k -> row? ] -- rows of code_freq are rows of V
    V = tm.code_freq[:20]
    M = np.einsum("ik,k,kj->ij", V, tm.eigenval, tm.eigeninv)
    # the published JTT92 table is only approximately reversible, so the
    # symmetrized eigendecomposition reproduces the generator to ~1e-5
    assert np.allclose(M.sum(axis=0), 0, atol=1e-4)
    assert np.allclose(M @ tm.stat, 0, atol=1e-4)
    # exp(M t) columns sum to 1 (probability conservation)
    from scipy.linalg import expm
    P = expm(M * 0.3)
    assert np.allclose(P.sum(axis=0), 1.0, atol=1e-4)


def test_gtr_matches_jc_limit():
    # GTR with equal rates/freqs == Jukes-Cantor: P(same) = 0.25+0.75 exp(-4/3 t)
    tm = TransitionMatrix.gtr([1.0] * 6, [0.25] * 4)
    from scipy.linalg import expm
    M = np.einsum("ik,k,kj->ij", tm.code_freq[:4], tm.eigenval, tm.eigeninv)
    t = 0.7
    P = expm(M * t)
    expect = 0.25 + 0.75 * np.exp(-4.0 / 3.0 * t)
    assert np.allclose(np.diag(P), expect, atol=1e-8)


def test_me_dist_matches_numpy():
    rng = np.random.default_rng(0)
    M, P, C = 7, 24, 4
    V = rng.dirichlet(np.ones(C), size=(M, P))
    W = rng.uniform(0, 1, size=(M, P))
    W[0, :5] = 0
    U = W[..., None] * V
    uq, wq = U[2], W[2]
    # plain mode: piece = 1 - f1.f2
    dist, denom = kernels.me_dist_many(jnp.asarray(U), jnp.asarray(W),
                                       jnp.asarray(uq), jnp.asarray(wq), None)
    for m in range(M):
        dn = (W[m] * W[2]).sum()
        top = sum(W[m, p] * W[2, p] * (1 - V[m, p] @ V[2, p]) for p in range(P))
        assert np.isclose(float(denom[m]), dn)
        assert np.isclose(float(dist[m]), top / dn, atol=1e-10)


def test_pair_loglk_jc_gap_is_quarter():
    P, C = 8, 4
    f1 = np.full((P, C), 0.25)
    f2 = np.tile(np.eye(C)[0], (P, 1))
    psame, pdiff = kernels.p_same_diff(0.3, jnp.ones(1))
    ll, lk = kernels.pair_loglk_jc(jnp.asarray(f1), jnp.asarray(f2), psame, pdiff,
                                   jnp.zeros(P, dtype=int), jnp.ones(P, dtype=bool))
    assert np.allclose(np.asarray(lk), 0.25, atol=1e-12)


def test_average_profile_coded_positions_exact():
    # children agreeing on a code must yield exactly the rotated one-hot
    dm = DistanceMatrix.blosum45()
    C = 20
    P = 4
    cf = jnp.asarray(dm.code_freq)
    codes = jnp.array([[3, 5, 127, 127]], dtype=jnp.int8)
    w = jnp.array([[1.0, 0.5, 0.0, 1.0]])
    v = cf[jnp.array([3, 5, 0, 7])][None] * (codes != 127)[..., None]
    v = v.at[0, 3].set(cf[7])
    u = w[..., None] * v
    c, wo, uo, _ = kernels.average_profile(
        codes[0], w[0], u[0], codes[0], w[0], u[0], 0.5, cf,
        jnp.asarray(dm.eigentot), 1e-10)
    assert int(c[0]) == 3 and int(c[1]) == 5 and int(c[2]) == 127
    assert np.allclose(np.asarray(uo[0]), np.asarray(cf[3]), atol=1e-6)
    assert np.allclose(np.asarray(uo[1]), 0.5 * np.asarray(cf[5]), atol=1e-6)
