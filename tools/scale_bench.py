"""Multi-process scaling benchmark for the sharded whole-batch pass-1.

The pod-scale story (SURVEY.md §2.4/§5.8): the FULL batched device pass-1
(ops/device_pass1.run_pass1_batch — every tier/rect/delta search plus the
partition DP, the program behind every TPU encode) runs pjit-sharded over
a global (data, tile) mesh spanning multiple processes. This harness
measures that program's throughput at 1 and 2 processes (gloo collectives
on CPU; the same code lays onto ICI/DCN on a TPU pod) and prints the
scaling factor.

Usage:  python tools/scale_bench.py [--n 4] [--size 512]
Prints one JSON line: {"mp_s_1proc": ..., "mp_s_2proc": ..., "scaling": ...}

On the CPU backend this validates the mechanism and the collective layout
(device count is virtualized, so the absolute numbers only demonstrate
overhead, not pod throughput); on ≥2 real hosts the same script is the
scaling measurement.
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import time
from pathlib import Path

ROOT = str(Path(__file__).resolve().parent.parent)

WORKER = """
import os, sys, time
import numpy as np
sys.path.insert(0, %(root)r)
np_proc = int(sys.argv[1]); pid = int(sys.argv[2]); coord = sys.argv[3]
n_img = int(sys.argv[4]); size = int(sys.argv[5])
import jax
if np_proc > 1:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=np_proc, process_id=pid)
from jax.sharding import Mesh
from cavif_tpu.ops.device_pass1 import run_pass1_batch

devs = np.array(jax.devices())
mesh = Mesh(devs.reshape(np_proc * 2, len(devs) // (np_proc * 2)),
            ("data", "tile"))
rng = np.random.default_rng(0)
srcs = rng.integers(0, 256, (n_img, size, size, 3), dtype=np.uint8)
kw = dict(depth=10, tile_px=(size, size), min_px=4, use_deltas=True,
          dc_q=499, ac_q=616, lam=30.0, mesh=mesh)
run_pass1_batch(srcs, **kw)  # compile + warm
t0 = time.perf_counter()
reps = 3
for _ in range(reps):
    out = run_pass1_batch(srcs, **kw)
dt = (time.perf_counter() - t0) / reps
mp = n_img * size * size / 1e6
if pid == 0:
    print("RESULT %%.6f" %% (mp / dt))
"""


def run_config(n_proc: int, n_img: int, size: int) -> float:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    per_proc_devs = 8 // n_proc
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": "",
        "XLA_FLAGS": f"--xla_force_host_platform_device_count={per_proc_devs}",
        "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_cache",
    }
    code = WORKER % {"root": ROOT}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code, str(n_proc), str(i), coord,
             str(n_img), str(size)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(n_proc)
    ]
    result = None
    for p in procs:
        out, err = p.communicate(timeout=600)
        if p.returncode != 0:
            raise RuntimeError(err[-1500:])
        for line in out.splitlines():
            if line.startswith("RESULT "):
                result = float(line.split()[1])
    assert result is not None
    return result


def _retry_gloo(fn):
    """One retry on the gloo rendezvous-deadline flake (the KV exchange
    at the first collective has a hard 30 s deadline that a cold XLA CPU
    compile can cross; the retry runs against the warm cache) — same
    policy as tests/test_multihost.py."""
    try:
        return fn()
    except RuntimeError as e:
        if "timed out" not in str(e) and "DEADLINE_EXCEEDED" not in str(e):
            raise
        return fn()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8, help="images per batch")
    ap.add_argument("--size", type=int, default=512)
    a = ap.parse_args()
    r1 = _retry_gloo(lambda: run_config(1, a.n, a.size))
    r2 = _retry_gloo(lambda: run_config(2, a.n, a.size))
    print(json.dumps({
        "mp_s_1proc": round(r1, 2),
        "mp_s_2proc": round(r2, 2),
        "scaling": round(r2 / r1, 3),
        "note": "whole-batch device pass-1 MP/s, virtual CPU mesh (8 "
                "devices total; 2-proc splits them 4+4 with gloo "
                "collectives)",
    }))


if __name__ == "__main__":
    main()
