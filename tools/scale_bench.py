"""Multi-process scaling benchmark for the sharded whole-plane mode search.

The pod-scale story (SURVEY.md §2.4/§5.8): the batched pass-1 search —
the encoder's dominant device workload — runs pjit-sharded over a global
(data, tile) mesh spanning multiple processes. This harness measures that
program's throughput at 1 and 2 processes (gloo collectives on CPU; the
same code lays onto ICI/DCN on a TPU pod) and prints the scaling factor.

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
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from cavif_tpu.ops.block_search import _kernel

devs = np.array(jax.devices())
mesh = Mesh(devs.reshape(np_proc * 2, len(devs) // (np_proc * 2)),
            ("data", "tile"))
n = 16
rng = np.random.default_rng(0)
planes = rng.integers(0, 1024, (n_img, 4 * size // n, size)).astype(np.int32)
f = _kernel(n, 10)
args = (np.float32(499), np.float32(616), np.float32(30.0))
sh = NamedSharding(mesh, P("data", "tile", None))
jf = jax.jit(f, in_shardings=(sh, None, None, None),
             out_shardings=NamedSharding(mesh, P("data", "tile", None)))
arr = jax.device_put(jnp.asarray(planes), sh)
jf(arr, *args)[0].block_until_ready()  # compile + warm
t0 = time.perf_counter()
reps = 5
for _ in range(reps):
    out = jf(arr, *args)
out[0].block_until_ready()
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8, help="images per batch")
    ap.add_argument("--size", type=int, default=512)
    a = ap.parse_args()
    r1 = run_config(1, a.n, a.size)
    r2 = run_config(2, a.n, a.size)
    print(json.dumps({
        "mp_s_1proc": round(r1, 2),
        "mp_s_2proc": round(r2, 2),
        "scaling": round(r2 / r1, 3),
        "note": "search-kernel MP/s, virtual CPU mesh (8 devices total; "
                "2-proc splits them 4+4 with gloo collectives)",
    }))


if __name__ == "__main__":
    main()
