"""1M-taxa memory plan: the hbm_plan fit formula matches the real store, and
a 200k-taxa two-tier store instantiates position-sharded on the 8-device mesh
(SURVEY.md section 5.7: pod-aggregate HBM replaces DiskMemory)."""
import os

import numpy as np
import pytest

import jax

from veryfasttree_tpu.engine.profiles import MEProfiles, hbm_plan
from veryfasttree_tpu.options import Options


def _store_nbytes(prof) -> int:
    return (prof.codes.nbytes + prof.W.nbytes + prof.U.nbytes
            + prof.w_out.nbytes + prof.f_out.nbytes)


def test_hbm_plan_matches_real_store():
    for n, p, tt in [(300, 200, False), (300, 200, True), (1000, 130, True)]:
        opts = Options(n_codes=4)
        opts.derive_settings()
        codes = np.random.default_rng(0).integers(
            0, 4, size=(n, p)).astype(np.int8)
        prof = MEProfiles(codes, opts, None, 2 * n, two_tier=tt)
        prof.recompute_outprofile(np.ones(2 * n, dtype=bool))
        plan = hbm_plan(n, p, two_tier=tt)
        assert plan["two_tier"] == prof.two_tier
        assert plan["codes_bytes"] == prof.codes.nbytes
        assert plan["w_bytes"] == prof.W.nbytes
        assert plan["u_bytes"] == prof.U.nbytes
        # out-profile row is the only other per-position array
        assert abs(plan["total_bytes"] - _store_nbytes(prof)) \
            <= plan["total_bytes"] * 0.01


def test_1m_taxa_fits_v5e_slice():
    """The north-star config: 1M taxa x ~1300 nt positions, fp32, two-tier,
    position-sharded over an 8-chip v5e slice (16 GiB HBM per chip)."""
    plan = hbm_plan(1_000_000, 1300, n_codes=4, n_devices=8)
    assert plan["two_tier"]
    assert plan["total_bytes"] < 110 * 2**30, plan
    assert plan["fits_v5e_chip"], plan
    # and WITHOUT two-tier it would not fit (the tier is load-bearing)
    dense = hbm_plan(1_000_000, 1300, n_codes=4, n_devices=8, two_tier=False)
    assert dense["per_device_bytes"] > plan["per_device_bytes"]


def test_200k_x_5k_fit_formula():
    """The 200k-taxa x 5k-position config (VERDICT round-2 task 4): the fit
    formula says nt (C=4) fits an 8-chip slice while aa (C=20) needs a
    32-chip slice (per-chip ~15.3 GiB at 16 chips, just over budget); the
    formula itself is validated against real stores above."""
    nt = hbm_plan(200_000, 5000, n_codes=4, n_devices=8)
    assert nt["fits_v5e_chip"], nt
    aa16 = hbm_plan(200_000, 5000, n_codes=20, n_devices=16)
    aa32 = hbm_plan(200_000, 5000, n_codes=20, n_devices=32)
    assert not aa16["fits_v5e_chip"] and aa32["fits_v5e_chip"], (aa16, aa32)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_big_store_sharded_on_mesh():
    """Instantiate a 100k-taxa two-tier store (scaled to keep the suite fast;
    set VFT_BIG_N=200000 to run the full size) sharded on the 8-device mesh
    and compute through it (VERDICT round-2 task 4)."""
    try:
        import psutil  # noqa: F401
        free_gb = psutil.virtual_memory().available / 2**30
    except ImportError:
        free_gb = int(os.popen("awk '/MemAvailable/{print int($2/1048576)}' "
                               "/proc/meminfo").read() or 0)
    n, p = int(os.environ.get("VFT_BIG_N", 100_000)), 640
    plan = hbm_plan(n, p, n_devices=8)
    if free_gb < 3.0 * plan["total_bytes"] / 2**30:
        pytest.skip(f"needs ~{3.0 * plan['total_bytes'] / 2**30:.0f} GB free")

    from veryfasttree_tpu.parallel.mesh import make_mesh

    opts = Options(n_codes=4)
    opts.derive_settings()
    opts.mesh = make_mesh(n_sp=8, n_dp=1)
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 4, size=(n, p)).astype(np.int8)
    prof = MEProfiles(codes, opts, None, 2 * n)
    assert prof.two_tier
    # position axis genuinely sharded 8 ways
    assert prof.U.addressable_shards[0].data.shape[1] * 8 == prof.U.shape[1]
    assert prof.codes.addressable_shards[0].data.shape[1] * 8 == prof.codes.shape[1]
    # footprint matches the plan
    assert abs(_store_nbytes_partial(prof) - plan["codes_bytes"]
               - plan["w_bytes"] - plan["u_bytes"]) < 2**20
    # a real (cheap) device op through the sharded store: one leaf row query
    # + pair distance of two leaves (the full one-vs-all scan is exercised at
    # smaller N; here the point is the sharded 200k-store instantiates and
    # computes)
    d, w = prof.dist_pairs([0], [0])
    assert abs(d[0]) < 1e-6 and w[0] > 0  # self-distance


def _store_nbytes_partial(prof) -> int:
    return prof.codes.nbytes + prof.W.nbytes + prof.U.nbytes
