"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline (BASELINE.json): encode MP/s per chip at quality 80 / speed 4.
While the AV1 core is being built out, this measures the device-side encode
pipeline stages that exist so far; it graduates to full AVIF encode MP/s as
stages land.

vs_baseline is measured against REF_MPS, an estimate of multithreaded cavif
(rav1e speed 4, quality 80) throughput on a contemporary many-core host;
BASELINE.md records that the reference publishes no numbers, so this anchor
is an estimate to be refined when a measured number is available.
"""

from __future__ import annotations

import json
import time

import numpy as np

REF_MPS = 3.0  # estimated cavif --quality 80 --speed 4 multithread MP/s


def main() -> None:
    import jax

    from __graft_entry__ import entry

    fn, (example,) = entry()
    # realistic batch: 8x 1024x1024 RGB
    rng = np.random.default_rng(0)
    batch = rng.integers(0, 256, size=(8, 1024, 1024, 3), dtype=np.uint8)

    out = fn(batch)
    jax.block_until_ready(out)  # compile + warmup

    n_iter = 10
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn(batch)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iter

    megapixels = batch.shape[0] * batch.shape[1] * batch.shape[2] / 1e6
    mps = megapixels / dt
    print(
        json.dumps(
            {
                "metric": "frontend_pipeline_MP/s",
                "value": round(mps, 3),
                "unit": "MP/s",
                "vs_baseline": round(mps / REF_MPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
