"""Multi-chip sharding tests on the 8-device virtual CPU mesh:
collective kernels match single-device math, and the deterministic argmin
is invariant across mesh shapes."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from veryfasttree_tpu.parallel.mesh import make_mesh
from veryfasttree_tpu.parallel.sharded import (dist_scan_sharded,
                                               out_profile_sharded,
                                               pair_loglk_sharded,
                                               training_step)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _data(M=16, P=512, C=4, seed=0):
    rng = np.random.default_rng(seed)
    V = rng.dirichlet(np.ones(C), size=(M, P)).astype(np.float32)
    W = rng.uniform(0.3, 1.0, size=(M, P)).astype(np.float32)
    U = W[..., None] * V
    return U, W


def test_dist_scan_matches_local_and_mesh_invariant():
    U, W = _data()
    M, P, C = U.shape
    outd = np.random.default_rng(1).uniform(0, 2, M).astype(np.float32)
    ref_dots = U.reshape(M, -1) @ U[3].reshape(-1)
    ref_denom = W @ W[3]
    ref_dist = np.where(ref_denom > 0, (ref_denom - ref_dots) / ref_denom, 1.0)
    ref_crit = ref_dist - outd / (M - 2.0)

    results = []
    for n_dp, n_sp in [(1, 8), (2, 4), (4, 2), (1, 4), (1, 1)]:
        mesh = make_mesh(n_sp=n_sp, n_dp=n_dp)
        scan = dist_scan_sharded(mesh, use_matrix=False)
        best, best_crit, dist, denom = scan(jnp.asarray(U), jnp.asarray(W),
                                            jnp.asarray(U[3]), jnp.asarray(W[3]),
                                            jnp.asarray(outd), jnp.float32(M))
        assert np.allclose(np.asarray(dist), ref_dist, atol=1e-5)
        assert abs(float(best_crit) - ref_crit.min()) < 1e-5
        results.append(int(best))
    # deterministic argmin across mesh shapes (lowest-index tie-break)
    assert len(set(results)) == 1
    assert results[0] == int(np.argmin(ref_crit))


def test_pair_loglk_sharded_matches():
    P, C = 512, 4
    rng = np.random.default_rng(2)
    f1 = rng.dirichlet(np.ones(C), size=P).astype(np.float32)
    f2 = rng.dirichlet(np.ones(C), size=P).astype(np.float32)
    w = np.ones(P, dtype=np.float32)
    psame = np.array([0.7], dtype=np.float32)
    pdiff = np.array([0.1], dtype=np.float32)
    ratecat = np.zeros(P, dtype=np.int32)
    mask = np.ones(P, dtype=bool)
    mesh = make_mesh(n_sp=8, n_dp=1)
    f = pair_loglk_sharded(mesh)
    got = float(f(jnp.asarray(f1), jnp.asarray(f2), jnp.asarray(w),
                  jnp.asarray(w), jnp.asarray(psame), jnp.asarray(pdiff),
                  jnp.asarray(ratecat), jnp.asarray(mask)))
    lk = 0.1 * f2.sum(axis=1) + 0.6 * np.einsum("pc,pc->p", f1, f2)
    want = float(np.log(lk).sum())
    assert abs(got - want) < 1e-3


def test_out_profile_sharded_matches():
    U, W = _data(M=16, P=512)
    mask = np.ones(16, dtype=bool)
    mask[3] = False
    mesh = make_mesh(n_sp=4, n_dp=2)
    f = out_profile_sharded(mesh)
    w_out, f_out = f(jnp.asarray(U), jnp.asarray(W), jnp.asarray(mask))
    n = mask.sum()
    want_w = np.maximum(W[mask].sum(axis=0) / n, 1e-20)
    accum = U[mask].sum(axis=0)
    want_f = accum / np.maximum(accum.sum(axis=-1, keepdims=True), 1e-10)
    assert np.allclose(np.asarray(w_out), want_w, atol=1e-5)
    assert np.allclose(np.asarray(f_out), want_f, atol=1e-5)


def test_training_step_runs_on_mesh():
    """The sharded NJ 'training step' (scan + join + out-profile + loglk
    partials) compiles and runs under a dp x sp mesh.  The full
    pipeline-level dryrun runs in test_pipeline_mesh_shapes_subprocess."""
    U, W = _data(M=16, P=512)
    M, P_, C = U.shape
    outd = np.random.default_rng(4).uniform(0, 2, M).astype(np.float32)
    psame = np.array([0.7], dtype=np.float32)
    pdiff = np.array([0.1], dtype=np.float32)
    ratecat = np.zeros(P_, dtype=np.int32)
    mask = np.ones(P_, dtype=bool)
    mesh = make_mesh(n_sp=4, n_dp=2)
    step = training_step(mesh)
    best, best_crit, u_new, w_new, ll = step(
        jnp.asarray(U), jnp.asarray(W), jnp.asarray(U[3]), jnp.asarray(W[3]),
        jnp.asarray(outd), jnp.float32(M), jnp.asarray(psame),
        jnp.asarray(pdiff), jnp.asarray(ratecat), jnp.asarray(mask))
    assert np.isfinite(float(ll))
    assert u_new.shape == (P_, C) and 0 <= int(best) < M


# --- pipeline-level mesh integration -----------------------------------------
# The engine's profile stores carry NamedShardings when -mesh-sp/-mesh-dp are
# given (positions on 'sp', rows on 'dp'); GSPMD inserts the collectives.
# The -noml result must be bit-identical across mesh shapes.

def test_pipeline_mesh_shapes_subprocess(tmp_path):
    """-noml Newick bit-identical across mesh shapes + ML topology stable on
    a dp=2 x sp=4 mesh, in a FRESH subprocess.

    Subprocess on purpose: after a long-lived suite process has compiled
    many programs, the GSPMD compile of the mesh-sharded ML store functions
    intermittently stalls for tens of minutes (reproduced twice at the same
    call site; instant in a fresh process).  The driver's dryrun_multichip
    covers the same assertions in its own fresh process, so this mirrors
    the deployment environment as well as dodging the stall."""
    import os
    import subprocess
    import sys

    script = tmp_path / "mesh_pipeline.py"
    script.write_text(
        "import sys\n"
        "sys.path.insert(0, %r)\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(8)\n"
        "print('MESH_PIPELINE_OK')\n" % os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS",)}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    res = subprocess.run([sys.executable, str(script)], env=env,
                         capture_output=True, text=True, timeout=1800)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "MESH_PIPELINE_OK" in res.stdout


def test_pipeline_mesh_invariant_without_x64(tmp_path):
    """Regression for the r3 dryrun failure: dp=4 sp=2 flipped a near-tie
    join when the process had NOT pre-enabled x64 (the driver environment).
    run_pipeline must itself force f64 accumulation on CPU (the reference
    accumulates in double even in float mode, ref tcc:1167-1190), so a fresh
    f32 process still gets mesh-shape-invariant Newick."""
    import os
    import subprocess
    import sys

    script = tmp_path / "dryrun_noml.py"
    script.write_text(
        "import io, sys\n"
        "sys.path.insert(0, %r)\n"
        "from __graft_entry__ import dryrun_multichip\n"
        "import jax\n"
        "assert not jax.config.jax_enable_x64, 'env leaked x64'\n"
        "from veryfasttree_tpu.options import Options\n"
        "from veryfasttree_tpu.pipeline import run_pipeline\n"
        "import random\n"
        "rng = random.Random(7); alpha = 'ACGT'; n, p = 40, 200\n"
        "founder = [rng.choice(alpha) for _ in range(p)]\n"
        "seqs = [founder]\n"
        "while len(seqs) < n:\n"
        "    parent = seqs[rng.randrange(len(seqs))]\n"
        "    seqs.append([c if rng.random() > 0.12 else rng.choice(alpha)"
        " for c in parent])\n"
        "fasta = ''.join(f'>s{i}\\n{\"\".join(s)}\\n'"
        " for i, s in enumerate(seqs))\n"
        "def run(sp=None, dp=1):\n"
        "    o = Options(show_progress=False, n_codes=4, n_bootstrap=0,\n"
        "                mesh_sp=sp, mesh_dp=dp, ml_nni=0)\n"
        "    o.derive_settings()\n"
        "    out = io.StringIO()\n"
        "    run_pipeline(o, io.StringIO(fasta), out, log_fp=None)\n"
        "    return out.getvalue().strip()\n"
        "base = run()\n"
        "for dp, sp in [(4, 2), (2, 4)]:\n"
        "    assert run(sp, dp) == base, f'Newick differs on dp={dp} sp={sp}'\n"
        "print('MESH_NOX64_OK')\n" % os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "JAX_ENABLE_X64")}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    res = subprocess.run([sys.executable, str(script)], env=env,
                         capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "MESH_NOX64_OK" in res.stdout
