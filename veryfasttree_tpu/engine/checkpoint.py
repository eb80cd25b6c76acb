"""Array-state checkpointing for long phases (SURVEY.md section 5.4).

The reference's only restart facility is tree-as-checkpoint: -log persists
intermediate Newicks and -intree resumes from one (ref main.cpp:125-128,
logTree tcc:5516-5522).  That contract is kept (pipeline.log_tree); this
module adds what the reference lacks: full array-state checkpoints, so a
multi-hour ML phase on a pod resumes mid-phase without replaying the NJ/ME
work or losing the CAT rates / GTR fit / NNI aging statistics.

Format: one .npz (atomic rename) holding the tree arrays, the engine scalars,
the ME store, and -- when the ML phase has started -- the ML store including
its rotation constants (which embed any fitted GTR matrix) and CAT rates,
plus a JSON meta record (phase tag, round index, convergence scalars).
save_checkpoint fetches device arrays once per array; load_checkpoint pushes
them back through the store's sharding helper, so checkpoints written on one
mesh shape restore onto another.
"""
from __future__ import annotations

import json
import os

import numpy as np

_FORMAT = 1


def _tree_arrays(tree):
    return {
        "tree_parent": tree.parent, "tree_children": tree.children,
        "tree_n_child": tree.n_child, "tree_branchlength": tree.branchlength,
        "tree_support": tree.support,
        "tree_scal": np.array([tree.maxnode, tree.root], dtype=np.int64),
    }


def save_checkpoint(nj, path: str, meta: dict, extra: dict | None = None) -> None:
    """Snapshot engine + store state to `path` (atomic).  `extra` is a dict of
    caller-owned numpy arrays (e.g. NNI aging stats) stored alongside."""
    data = dict(_tree_arrays(nj.tree))
    for k, v in (extra or {}).items():
        data["x_" + k] = np.asarray(v)
    data.update(
        nj_diameter=nj.diameter, nj_var_diameter=nj.var_diameter,
        nj_selfdist=nj.selfdist, nj_selfweight=nj.selfweight,
        nj_out_distances=nj.out_distances,
        nj_n_out_dist_active=nj.n_out_dist_active,
        nj_scal=np.array([nj.totdiam], dtype=np.float64),
    )
    if nj.n_cons:
        data.update(nj_con_on=nj.con_on, nj_con_off=nj.con_off,
                    nj_con_out_on=nj.con_out_on, nj_con_out_off=nj.con_out_off)
    prof = nj.prof
    data.update(
        me_codes=np.asarray(prof.codes), me_W=np.asarray(prof.W),
        me_U=np.asarray(prof.U),
        me_w_out=np.asarray(prof.w_out), me_f_out=np.asarray(prof.f_out),
    )
    ml = getattr(nj, "ml", None)
    if ml is not None:
        data.update(
            ml_codes=np.asarray(ml.codes), ml_W=np.asarray(ml.W),
            ml_V=np.asarray(ml.V),
            ml_rates=ml.rates_np, ml_ratecat=ml.ratecat_np,
            ml_code_freq=np.asarray(ml.code_freq),
            ml_eigenval=np.asarray(ml.eigenval),
            ml_statinv=np.asarray(ml.statinv),
            ml_eigeninv=np.asarray(ml.eigeninv),
            ml_eigentot=np.asarray(ml.eigentot),
            ml_near_p=np.asarray(ml.near_p),
            ml_near_freq=np.asarray(ml.near_freq),
            ml_flags=np.array([int(ml.jc), int(ml.use_approx)], dtype=np.int64),
        )
    meta = dict(meta)
    meta["format"] = _FORMAT
    meta["has_ml"] = ml is not None
    data["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **data)
    os.replace(tmp, path)


def load_checkpoint(nj, path: str) -> tuple[dict, dict]:
    """Restore a checkpoint into an engine built from the SAME alignment and
    options; returns (meta, extra) -- the phase/round record and any
    caller-owned arrays stored via save_checkpoint(extra=...)."""
    import jax.numpy as jnp

    from .profiles import _shard_put

    z = np.load(path)
    meta = json.loads(bytes(z["meta_json"]).decode())
    if meta.get("format") != _FORMAT:
        raise ValueError(f"unsupported checkpoint format: {meta.get('format')}")

    tree = nj.tree
    tree.parent[:] = z["tree_parent"]
    tree.children[:] = z["tree_children"]
    tree.n_child[:] = z["tree_n_child"]
    tree.branchlength[:] = z["tree_branchlength"]
    tree.support[:] = z["tree_support"]
    tree.maxnode, tree.root = (int(x) for x in z["tree_scal"])

    nj.diameter[:] = z["nj_diameter"]
    nj.var_diameter[:] = z["nj_var_diameter"]
    nj.selfdist[:] = z["nj_selfdist"]
    nj.selfweight[:] = z["nj_selfweight"]
    nj.out_distances[:] = z["nj_out_distances"]
    nj.n_out_dist_active[:] = z["nj_n_out_dist_active"]
    nj.totdiam = float(z["nj_scal"][0])
    if nj.n_cons and "nj_con_on" in z:
        nj.con_on[:] = z["nj_con_on"]
        nj.con_off[:] = z["nj_con_off"]
        nj.con_out_on[:] = z["nj_con_out_on"]
        nj.con_out_off[:] = z["nj_con_out_off"]
    nj._out_raw.clear()
    nj._out_raw_version = -1

    prof = nj.prof
    mesh = prof.mesh
    prof.codes = _shard_put(z["me_codes"], mesh, (None, "sp"))
    prof.W = _shard_put(z["me_W"], mesh, ("dp", "sp"))
    prof.U = _shard_put(z["me_U"], mesh, ("dp", "sp", None))
    prof.w_out = jnp.asarray(z["me_w_out"])
    prof.f_out = jnp.asarray(z["me_f_out"])
    prof.out_version += 1

    if meta.get("has_ml"):
        from .ml_profiles import MLProfiles

        ml = getattr(nj, "ml", None)
        if ml is None:
            ml = MLProfiles.__new__(MLProfiles)
            _init_ml_shell(ml, nj)
            nj.ml = ml
        dt = ml.dtype
        ml.codes = _shard_put(z["ml_codes"], mesh, (None, "sp"))
        ml.W = _shard_put(z["ml_W"], mesh, ("dp", "sp"))
        ml.V = _shard_put(z["ml_V"], mesh, ("dp", "sp", None))
        ml.rates_np = z["ml_rates"]
        ml.ratecat_np = z["ml_ratecat"]
        ml._push_rates()
        ml.code_freq = jnp.asarray(z["ml_code_freq"], dtype=dt)
        ml.eigenval = jnp.asarray(z["ml_eigenval"], dtype=dt)
        ml.statinv = jnp.asarray(z["ml_statinv"], dtype=dt)
        ml.eigeninv = jnp.asarray(z["ml_eigeninv"], dtype=dt)
        ml.eigentot = jnp.asarray(z["ml_eigentot"], dtype=dt)
        ml.near_p = jnp.asarray(z["ml_near_p"], dtype=dt)
        ml.near_freq = jnp.asarray(z["ml_near_freq"], dtype=dt)
        ml.jc = bool(z["ml_flags"][0])
        ml.use_approx = bool(z["ml_flags"][1])
        from ..constants import NOCODE
        ml.gap_vec = (jnp.full((ml.n_codes,), 0.25, dtype=dt) if ml.jc
                      else ml.code_freq[NOCODE])
    extra = {k[2:]: z[k] for k in z.files if k.startswith("x_")}
    return meta, extra


def _init_ml_shell(ml, nj):
    """Fill the non-array fields of a bare MLProfiles (the arrays come from
    the checkpoint)."""
    import jax.numpy as jnp

    from .ml_profiles import N_SCRATCH

    opts = nj.options
    me = nj.prof
    ml.options = opts
    ml.nj = nj
    ml.transmat = nj.transmat
    ml.n_pos = me.n_pos
    ml.p_pad = me.p_pad
    ml.maxnodes = me.maxnodes
    ml.n_codes = opts.n_codes
    ml.dtype = me.dtype
    ml.tol = float(opts.f_post_total_tolerance)
    ml.min_len = me.dtype(opts.ml_min_branch_length)
    ml.min_rel_len = me.dtype(opts.ml_min_rel_branch_length)
    ml.mesh = me.mesh
    ml.batch_scratch0 = 2 * ml.maxnodes + N_SCRATCH
    pos_mask = np.zeros(ml.p_pad, dtype=bool)
    pos_mask[: ml.n_pos] = True
    ml.pos_mask = jnp.asarray(pos_mask)
    ml._rough_acc = jnp.zeros((), jnp.float32)
    ml._exact_acc = jnp.zeros((), jnp.float32)
