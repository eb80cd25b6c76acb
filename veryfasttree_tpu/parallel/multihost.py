"""Multi-host (multi-process) execution support.

The reference is strictly single-process OpenMP (src/VeryFastTree.cpp:262-265);
this module is the DCN half of SURVEY.md section 5.8: `jax.distributed`
initialization gated behind CLI flags, after which `jax.devices()` is the
GLOBAL device list and the normal -mesh-sp/-mesh-dp mesh spans hosts (ICI
within a slice, DCN across hosts -- on CPU test rigs, the distributed
service's TCP transport).

Design: every process runs the IDENTICAL host orchestration (deterministic
join order makes this lockstep by construction); device arrays are globally
sharded, and each device->host fetch of a non-fully-addressable array is an
`allgather` collective (engine/profiles.fetch_np), reached by all processes
in the same order.  Only process 0 writes user-facing output.

Verified by tests/test_multihost.py: a 2-process CPU run (4 virtual devices
each, dp=4 x sp=2 global mesh) produces a Newick bit-identical to the
single-process 8-device run.
"""
from __future__ import annotations

import os


def maybe_init_distributed(options) -> bool:
    """Initialize jax.distributed when multi-host flags are present.

    Gated by -coordinator HOST:PORT -n-hosts K -host-id I (or the
    VFT_COORDINATOR / VFT_N_HOSTS / VFT_HOST_ID environment variables).
    Must run before the first backend use.  Returns True when distributed
    mode is active."""
    coord = getattr(options, "coordinator", None) \
        or os.environ.get("VFT_COORDINATOR")
    if not coord:
        return False
    n_hosts = int(getattr(options, "n_hosts", 0)
                  or os.environ.get("VFT_N_HOSTS", "0"))
    host_id = int(getattr(options, "host_id", None)
                  if getattr(options, "host_id", None) is not None
                  else os.environ.get("VFT_HOST_ID", "0"))
    import jax
    # idempotent: with -n > 1 alignments _run_single calls this once per
    # alignment; a second initialize() raises RuntimeError
    if getattr(jax.distributed, "is_initialized", None) and \
            jax.distributed.is_initialized():
        return True
    if getattr(maybe_init_distributed, "_done", False):
        return True
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=n_hosts or None,
                               process_id=host_id)
    maybe_init_distributed._done = True
    return True


def is_primary() -> bool:
    """True on the process that should write user-facing output."""
    import jax
    return jax.process_index() == 0
