#!/usr/bin/env python3
"""Benchmark: profile-distance scan throughput (the NJ hot kernel).

The dominant compute of VeryFastTree's NJ phase is the one-vs-many profile
distance scan (setBestHit / setAllLeafTopHits seed scans, ref
NeighbourJoining.tcc:3571-3646, 3746-4124): for each of ~N seed profiles,
distances against all N profiles over all P positions.  In this framework that
is a single [M, P*C] x [P*C, Q] GEMM on the MXU plus a [M, P] x [P, Q] GEMM
for the weight denominators -- exactly what this bench times on the TPU.

Baseline: the same contraction executed by host numpy/BLAS (the reference's
AVX-on-CPU compute model).  vs_baseline = TPU throughput / host throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    M, P, C, Q = 4096, 1024, 4, 512
    K = P * C
    rng = np.random.default_rng(0)
    V = rng.dirichlet(np.ones(C), size=(M, P)).astype(np.float32)
    W = rng.uniform(0.5, 1.0, size=(M, P)).astype(np.float32)
    U = (W[..., None] * V).reshape(M, K)
    Uq = U[:Q].T.copy()  # [K, Q]
    Wq = W[:Q].T.copy()  # [P, Q]

    def make_chain(n_iter):
        @jax.jit
        def scan_chain(U, W, Uq, Wq):
            # chain iterations through a non-factorable feedback (U^T @ dist)
            # so XLA cannot hoist or algebraically fold the GEMMs out of the
            # loop; consume the full dist matrix to defeat DCE.
            def body(_, carry):
                Uq, acc = carry
                dots = U @ Uq        # [M, Q] position-summed piece dot products
                denom = W @ Wq       # [M, Q] weights
                dist = jnp.where(denom > 0,
                                 (denom - dots) / jnp.where(denom > 0, denom, 1.0),
                                 1.0)
                Uq = Uq + (1e-9 / M) * (U.T @ dist)
                Uq = Uq / jnp.max(jnp.abs(Uq))
                return Uq, acc + dist.sum()
            return jax.lax.fori_loop(0, n_iter, body, (Uq, jnp.float32(0)))[1]
        return scan_chain

    dU, dW, dUq, dWq = map(jnp.asarray, (U, W.reshape(M, P), Uq, Wq))
    n1, n2 = 20, 60
    f1, f2 = make_chain(n1), make_chain(n2)
    float(f1(dU, dW, dUq, dWq))  # compile + warm
    float(f2(dU, dW, dUq, dWq))
    def timed(f):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(dU, dW, dUq, dWq))
            best = min(best, time.perf_counter() - t0)
        return best

    ta = timed(f1)
    tb = timed(f2)
    # difference cancels the fixed dispatch/fetch latency of the tunnel
    t_tpu = max(tb - ta, 1e-9) / (n2 - n1)

    flops = 2.0 * M * Q * (2 * K + P)
    tpu_gflops = flops / t_tpu / 1e9
    scans_per_s = Q / t_tpu  # one "scan" = one seed's one-vs-all distance pass

    # host numpy baseline (the reference's CPU compute model)
    t0 = time.perf_counter()
    n_np = 3
    for _ in range(n_np):
        dots = U @ Uq
        denom = W.reshape(M, P) @ Wq
        dist = np.where(denom > 0, (denom - dots) / np.where(denom > 0, denom, 1.0), 1.0)
        Uq = Uq + (1e-9 / M) * (U.T @ dist)  # same feedback GEMM as the TPU chain
    t_cpu = (time.perf_counter() - t0) / n_np
    cpu_gflops = flops / t_cpu / 1e9

    print(json.dumps({
        "metric": "profile-dist one-vs-all scans/s (N=4096, P=1024, nt)",
        "value": round(scans_per_s, 1),
        "unit": "scans/s",
        "vs_baseline": round(tpu_gflops / cpu_gflops, 2),
    }))


if __name__ == "__main__":
    main()
