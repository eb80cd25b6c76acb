"""Multi-host (multi-process) prototype: 2-process CPU run over a global
device mesh must produce a Newick bit-identical to the single-process run.

The reference has no multi-process layer (OpenMP only,
src/VeryFastTree.cpp:262-265); this is the DCN half of SURVEY.md section 5.8.
Each process gets 4 virtual CPU devices; jax.distributed joins them into one
8-device mesh (dp=4 x sp=2).  Both processes run the identical host
orchestration; sharded fetches allgather (engine/profiles.fetch_np)."""
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = """
import io, random, sys
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")
from veryfasttree_tpu.options import Options
from veryfasttree_tpu.parallel.multihost import maybe_init_distributed
from veryfasttree_tpu.pipeline import run_pipeline

pid = int(sys.argv[1]); n_proc = int(sys.argv[2])
rng = random.Random(7); alpha = "ACGT"; n, p = 40, 200
founder = [rng.choice(alpha) for _ in range(p)]
seqs = [founder]
while len(seqs) < n:
    parent = seqs[rng.randrange(len(seqs))]
    seqs.append([c if rng.random() > 0.12 else rng.choice(alpha)
                 for c in parent])
fasta = "".join(f">s{i}\\n{''.join(s)}\\n" for i, s in enumerate(seqs))

opts = Options(show_progress=False, n_codes=4, n_bootstrap=0, ml_nni=0,
               mesh_sp=2, mesh_dp=4,
               coordinator=(%(coord)r if n_proc > 1 else ""),
               n_hosts=n_proc, host_id=pid)
opts.derive_settings()
out = io.StringIO()
run_pipeline(opts, io.StringIO(fasta), out, log_fp=None)
print("NEWICK:" + out.getvalue().strip(), flush=True)
"""


def _spawn(tmp_path, pid, n_proc, coord, n_devices):
    script = tmp_path / f"mh_{n_proc}_{pid}.py"
    script.write_text(_SCRIPT % {"repo": REPO, "coord": coord})
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "JAX_ENABLE_X64")}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    return subprocess.Popen([sys.executable, str(script), str(pid),
                             str(n_proc)], env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True)


def _newick(proc):
    out, err = proc.communicate(timeout=600)
    assert proc.returncode == 0, err[-2000:]
    lines = [l for l in out.splitlines() if l.startswith("NEWICK:")]
    assert lines, out
    return lines[0]


def test_two_process_newick_identical(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        coord = f"127.0.0.1:{s.getsockname()[1]}"
    p1 = _spawn(tmp_path, 1, 2, coord, 4)
    p0 = _spawn(tmp_path, 0, 2, coord, 4)
    nw0 = _newick(p0)
    nw1 = _newick(p1)
    single = _spawn(tmp_path, 0, 1, "", 8)
    nw_s = _newick(single)
    assert nw0 == nw_s, "2-process Newick differs from single-process"
    assert nw1 == nw_s, "non-primary process diverged"
