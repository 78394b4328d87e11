"""Probe 2: design-space measurement for the fused device pass-1.

Measures on the real chip:
  V0  device-resident planes, per-tier 13-mode search (compute only)
  V1  one fused program: uint8 RGB upload -> on-device BT.601 -> 3 tiers
      searched for all 3 planes -> joint-UV tier costs out (end-to-end)
  V2  expanded directional candidates (V/H/6 diagonals x deltas -3..3,
      61 total) for one tier — the all-deltas refine alternative
"""

from __future__ import annotations

import time

import numpy as np


def timeit(fn, n=5, warmup=2):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), sum(ts) / len(ts)


def main():
    import jax
    import jax.numpy as jnp

    from cavif_tpu.ops.block_search import _search_body

    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(0)
    planes_np = rng.integers(0, 1024, size=(3, 1024, 1024), dtype=np.int32)
    planes = jax.device_put(planes_np)
    qargs = (jnp.float32(499), jnp.float32(616), jnp.float32(30.0))

    # V0: device-resident per-tier compute
    for n in (8, 16, 32):
        f = jax.jit(_search_body(n, 10))
        out = f(planes, *qargs)
        jax.block_until_ready(out)
        mn, avg = timeit(lambda: jax.block_until_ready(f(planes, *qargs)))
        print(f"V0 resident tier n={n}: min {mn*1e3:.1f} ms avg {avg*1e3:.1f} ms")

    # V0b: all three tiers in ONE jitted program
    bodies = {n: _search_body(n, 10) for n in (8, 16, 32)}

    @jax.jit
    def fused(p, dq, aq, lam):
        return {n: bodies[n](p, dq, aq, lam) for n in (8, 16, 32)}

    out = fused(planes, *qargs)
    jax.block_until_ready(out)
    mn, avg = timeit(lambda: jax.block_until_ready(fused(planes, *qargs)))
    print(f"V0b fused 3 tiers resident: min {mn*1e3:.1f} ms avg {avg*1e3:.1f} ms")

    # V1: uint8 RGB upload + on-device conversion + 3 tiers, end to end
    from cavif_tpu.ops import colorspace

    rgb = rng.integers(0, 256, size=(1024, 1024, 3), dtype=np.uint8)

    @jax.jit
    def e2e(rgb_in, dq, aq, lam):
        ycbcr = colorspace.rgb_to_ycbcr(rgb_in, depth=10)
        p = ycbcr.transpose(2, 0, 1)
        return {n: bodies[n](p, dq, aq, lam) for n in (8, 16, 32)}

    out = e2e(rgb, *qargs)
    jax.block_until_ready(out)

    def run_e2e():
        o = e2e(rgb, *qargs)
        return {k: (np.asarray(m), np.asarray(c)) for k, (m, c) in o.items()}

    mn, avg = timeit(run_e2e)
    print(f"V1 e2e uint8 upload + convert + 3 tiers + D2H: "
          f"min {mn*1e3:.1f} ms avg {avg*1e3:.1f} ms")

    # upload cost alone for the uint8 image
    mn, avg = timeit(lambda: jax.device_put(rgb).block_until_ready(), n=8)
    print(f"H2D 3MB uint8: min {mn*1e3:.1f} ms avg {avg*1e3:.1f} ms")

    # V2: expanded directional set at one tier — emulate cost by running the
    # tier body 4x (49 vs 13 candidates ~ 3.8x quant/RD work)
    f16 = jax.jit(_search_body(16, 10))

    @jax.jit
    def x4(p, dq, aq, lam):
        outs = [f16(p, dq, aq, lam) for _ in range(4)]
        return outs

    out = x4(planes, *qargs)
    jax.block_until_ready(out)
    mn, avg = timeit(lambda: jax.block_until_ready(x4(planes, *qargs)))
    print(f"V2 4x tier n=16 (delta-search proxy): min {mn*1e3:.1f} ms "
          f"avg {avg*1e3:.1f} ms")


if __name__ == "__main__":
    main()
