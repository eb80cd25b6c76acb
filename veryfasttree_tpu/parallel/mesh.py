"""Device mesh construction for multi-chip runs.

The natural parallel axes of profile-NJ (SURVEY.md section 5.7/5.8):
* ``sp`` -- the alignment-position axis.  Profiles (weights/vectors) are
  sharded along positions; profile distances and log-likelihoods become local
  partial reductions + psum over ``sp`` (replacing the reference's
  OpenMP-shared-memory position loops and its disk-computing spill path with
  pod-aggregate HBM).
* ``dp`` -- the candidate/node axis.  One-vs-many scans shard the "many" rows;
  the global best-join argmin is an allreduce with lowest-index tie-breaking,
  which preserves the reference's deterministic join order.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_sp: int | None = None, n_dp: int = 1, devices=None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    if n_sp is None:
        n_sp = len(devs) // n_dp
    assert n_sp * n_dp <= len(devs), (n_sp, n_dp, len(devs))
    grid = np.array(devs[: n_sp * n_dp]).reshape(n_dp, n_sp)
    return Mesh(grid, axis_names=("dp", "sp"))


def mesh_from_options(options) -> Mesh | None:
    """Build the engine mesh requested by -mesh-sp / -mesh-dp, or None for
    single-device execution (the default when neither flag is given -- the
    mesh is opt-in so single-chip runs and the CPU parity suite stay on the
    unsharded code path)."""
    sp = getattr(options, "mesh_sp", None)
    dp = getattr(options, "mesh_dp", 1) or 1
    if sp is None and dp <= 1:
        return None
    devs = jax.devices()
    if sp is None:
        sp = max(1, len(devs) // dp)
    if sp * dp <= 1:
        return None
    if sp * dp > len(devs):
        raise ValueError(f"mesh {dp}x{sp} needs {sp * dp} devices, "
                         f"have {len(devs)}")
    return make_mesh(n_sp=sp, n_dp=dp)
