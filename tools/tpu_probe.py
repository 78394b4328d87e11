"""Probe the attached TPU: tunnel round-trip latency, device-search
throughput at each tier, Pallas-on-hardware status. Measurement harness for
sizing the default device path (prints timings; not a test)."""

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

    print("backend:", jax.default_backend(), jax.devices())

    # 1. round-trip latency: tiny op + host sync
    x = jnp.ones((8, 8), jnp.float32)
    f = jax.jit(lambda a: a + 1.0)
    f(x).block_until_ready()
    mn, avg = timeit(lambda: np.asarray(f(x)), n=20, warmup=3)
    print(f"tiny-op round trip: min {mn*1e3:.2f} ms avg {avg*1e3:.2f} ms")

    # 2. H2D + D2H of a 1024x1024x3 plane batch
    planes = np.random.default_rng(0).integers(
        0, 1024, size=(3, 1024, 1024), dtype=np.int32
    )
    mn, avg = timeit(
        lambda: jax.device_put(planes).block_until_ready(), n=10
    )
    print(f"H2D 12MB: min {mn*1e3:.2f} ms avg {avg*1e3:.2f} ms")
    d = jax.device_put(planes)
    mn, avg = timeit(lambda: np.asarray(d), n=10)
    print(f"D2H 12MB: min {mn*1e3:.2f} ms avg {avg*1e3:.2f} ms")

    # 3. XLA whole-plane search per tier
    from cavif_tpu.ops.block_search import (
        plane_mode_search_costs,
        plane_partition_search,
    )

    for n in (8, 16, 32):
        t0 = time.perf_counter()
        plane_mode_search_costs(planes, 499, 616, 30.0, 10, n=n)
        compile_t = time.perf_counter() - t0
        mn, avg = timeit(
            lambda: plane_mode_search_costs(planes, 499, 616, 30.0, 10, n=n),
            n=5,
        )
        print(
            f"xla search n={n}: compile {compile_t:.2f}s "
            f"steady min {mn*1e3:.1f} ms avg {avg*1e3:.1f} ms"
        )

    # 4. full multi-tier partition program
    t0 = time.perf_counter()
    plane_partition_search(planes, 499, 616, 30.0, 10)
    compile_t = time.perf_counter() - t0
    mn, avg = timeit(
        lambda: plane_partition_search(planes, 499, 616, 30.0, 10), n=5
    )
    print(
        f"partition program (8/16/32): compile {compile_t:.2f}s "
        f"steady min {mn*1e3:.1f} ms avg {avg*1e3:.1f} ms"
    )

    # 5. Pallas on hardware (n=8, n=16)
    from cavif_tpu.ops.pallas_search import plane_mode_search_pallas

    for n in (8, 16):
        try:
            t0 = time.perf_counter()
            plane_mode_search_pallas(planes, 499, 616, 30.0, 10, n=n)
            compile_t = time.perf_counter() - t0
            mn, avg = timeit(
                lambda: plane_mode_search_pallas(
                    planes, 499, 616, 30.0, 10, n=n
                ),
                n=5,
            )
            print(
                f"pallas search n={n}: compile {compile_t:.2f}s "
                f"steady min {mn*1e3:.1f} ms avg {avg*1e3:.1f} ms"
            )
        except Exception as e:  # noqa: BLE001
            print(f"pallas n={n} FAILED: {type(e).__name__}: {e}"[:500])

    # 6. host native search baseline for the same work
    import os

    from cavif_tpu import native  # noqa: F401  (build)
    from cavif_tpu.av1.config import AV1Config
    from cavif_tpu.av1.encoder import FrameEncoder
    from cavif_tpu.av1.speed import SpeedTweaks

    cfg = AV1Config(
        width=1024, height=1024, bit_depth=10, quantizer=121,
        tweaks=SpeedTweaks.from_preset(4, 121), threads=os.cpu_count(),
    )
    enc = FrameEncoder(
        np.stack([planes[0], planes[1], planes[2]], axis=-1) >> 0, cfg
    )

    def host_pass1():
        enc._ops_cache.clear()
        enc._tile_skeleton(0, enc.mi_rows, 0, enc.mi_cols)

    mn, avg = timeit(host_pass1, n=3, warmup=1)
    print(f"host native pass1+skeleton: min {mn*1e3:.1f} ms avg {avg*1e3:.1f} ms")


if __name__ == "__main__":
    main()
