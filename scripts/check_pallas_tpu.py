#!/usr/bin/env python3
"""TPU-only equivalence check: Pallas scans vs the jnp fallback paths.

Run on a real TPU (the CPU test suite pins jax to cpu and cannot exercise
Pallas).  Asserts dist/denom agreement at 1e-6 and argmin identity for:
  * nj_scan (dense rows)
  * nj_scan_two_tier (int8 leaf codes + dense internal rows)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from veryfasttree_tpu.ops import kernels, pallas_kernels as pk

    assert jax.default_backend() == "tpu", "this check needs a TPU"
    rng = np.random.default_rng(0)
    n_seqs, m_int, P, C = 300, 256, 256, 4
    n_rows = 768

    codes = rng.integers(0, C, size=(n_rows, P)).astype(np.int8)
    codes[rng.random((n_rows, P)) < 0.05] = 127  # NOCODE gaps
    W_int = rng.uniform(0.3, 1.0, size=(m_int, P)).astype(np.float32)
    V = rng.dirichlet(np.ones(C), size=(m_int, P)).astype(np.float32)
    U_int = W_int[..., None] * V
    uq = rng.dirichlet(np.ones(C), size=P).astype(np.float32)
    wq = rng.uniform(0.3, 1.0, size=P).astype(np.float32)
    uq = wq[:, None] * uq
    outd = rng.uniform(0.0, 2.0, size=n_seqs + m_int).astype(np.float32)
    eigenval = rng.uniform(-1.0, 0.0, size=C).astype(np.float32)
    code_freq = np.eye(C, dtype=np.float32) + 0.01 * rng.random((C, C)).astype(np.float32)

    codes_j, W_j, U_j, uq_j, wq_j, outd_j = map(
        jnp.asarray, (codes, W_int, U_int, uq, wq, outd))
    ev_j, cf_j = jnp.asarray(eigenval), jnp.asarray(code_freq)

    for use_matrix in (False, True):
        ev = ev_j if use_matrix else None
        bi, bc, d, w, cr = pk.nj_scan_two_tier(
            codes_j, W_j, U_j, uq_j, wq_j, outd_j, 100, n_seqs, ev, cf_j)
        # jnp reference
        d_leaf, w_leaf = kernels.me_dist_many_codes(
            codes_j[:n_seqs], uq_j, wq_j, ev, cf_j, jnp.float32)
        d_int, w_int = kernels.me_dist_many(U_j, W_j, uq_j, wq_j, ev)
        d_ref = np.concatenate([np.asarray(d_leaf), np.asarray(d_int)])
        w_ref = np.concatenate([np.asarray(w_leaf), np.asarray(w_int)])
        crit_ref = d_ref - np.asarray(outd) / (100 - 2.0)
        np.testing.assert_allclose(np.asarray(d), d_ref, atol=2e-6, rtol=2e-6)
        np.testing.assert_allclose(np.asarray(w), w_ref, atol=2e-6, rtol=2e-6)
        bi_ref = int(np.argmin(crit_ref))
        assert int(bi) == bi_ref, (int(bi), bi_ref, use_matrix)
        print(f"nj_scan_two_tier use_matrix={use_matrix}: OK "
              f"(best {int(bi)} crit {float(bc):.6f})")

    # dense nj_scan
    n_dense = 512
    W_d = rng.uniform(0.3, 1.0, size=(n_dense, P)).astype(np.float32)
    U_d = W_d[..., None] * rng.dirichlet(np.ones(C), size=(n_dense, P)).astype(np.float32)
    outd_d = rng.uniform(0.0, 2.0, size=n_dense).astype(np.float32)
    for use_matrix in (False, True):
        ev = np.asarray(eigenval) if use_matrix else None
        bi, bc, d, w, cr = pk.nj_scan(jnp.asarray(U_d), jnp.asarray(W_d),
                                      uq_j, wq_j, jnp.asarray(outd_d), 100,
                                      jnp.asarray(ev) if ev is not None else None)
        d_ref, w_ref = kernels.me_dist_many(
            jnp.asarray(U_d), jnp.asarray(W_d), uq_j, wq_j,
            jnp.asarray(ev) if ev is not None else None)
        np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), atol=2e-6, rtol=2e-6)
        np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), atol=2e-6, rtol=2e-6)
        print(f"nj_scan dense use_matrix={use_matrix}: OK")
    print("ALL PALLAS CHECKS PASS")


if __name__ == "__main__":
    main()
