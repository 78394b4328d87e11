"""The BASELINE.json "batch of 512 mixed inputs" config, end to end.

512 synthetic images across four shape buckets (every 8th an RGBA with a
live alpha region — the reference's par_iter-over-arbitrary-files
semantics, /root/reference/src/main.rs:223), encoded at Q80/s4 through
both batch paths:

- hybrid per-image scheduler (parallel.encode_batch): chip + host cores
  on different images;
- sharded whole-batch (parallel.encode_batch_sharded): per-bucket
  batched device programs, host pass-2 streamed per sub-batch.

Prints warm MP/s for each (first pass per path warms compiles/pools).

Usage: python tools/batch512_bench.py [--n 512] [--paths hybrid,sharded]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

SHAPES = ((384, 512), (512, 512), (256, 384), (512, 768))


def make_images(n: int):
    rng = np.random.default_rng(11)
    imgs = []
    total_mp = 0.0
    for i in range(n):
        h, w = SHAPES[i % len(SHAPES)]
        y, x = np.mgrid[0:h, 0:w].astype(np.float64)
        base = (
            120 + 70 * np.sin(x / (37 + 13 * (i % 7)))
            * np.cos(y / (53 + 7 * (i % 5)))
        )
        lum = np.clip(base + rng.normal(0, 5, (h, w)), 0, 255)
        img = np.stack(
            [np.clip(lum + 12, 0, 255), lum, np.clip(lum - 15, 0, 255)],
            axis=-1,
        ).astype(np.uint8)
        if i % 8 == 3:  # live alpha region
            a = np.full((h, w), 255, np.uint8)
            a[h // 4 : h // 2, w // 4 : 3 * w // 4] = rng.integers(
                0, 255, (h // 4, w // 2), np.uint8
            )
            img = np.dstack([img, a])
        imgs.append(img)
        total_mp += h * w / 1e6
    return imgs, total_mp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--paths", default="hybrid,sharded")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--trace", action="store_true",
                    help="stage breakdown of the LAST rep per path "
                         "(cross-thread span totals + per-image means)")
    args = ap.parse_args()

    from cavif_tpu import Encoder
    from cavif_tpu.parallel import encode_batch
    from cavif_tpu.parallel.batch import encode_batch_sharded

    imgs, total_mp = make_images(args.n)
    enc = Encoder.new().with_quality(80).with_speed(4)
    print(f"{args.n} images, {total_mp:.1f} MP total", flush=True)

    from cavif_tpu.utils import trace

    for path in args.paths.split(","):
        best = None
        for rep in range(args.reps):
            if args.trace and rep == args.reps - 1:
                trace.set_enabled(True)
                trace.set_accumulate(True)
            t0 = time.perf_counter()
            if path == "hybrid":
                res = encode_batch(imgs, enc)
                assert all(r.encoded is not None for r in res), [
                    r.error for r in res if r.error
                ][:1]
                nbytes = sum(len(r.encoded.avif_file) for r in res)
            else:
                out = encode_batch_sharded(imgs, enc)
                nbytes = sum(len(b) for b in out)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            print(
                f"  {path} rep{rep}: {dt:.1f} s = "
                f"{total_mp / dt:.2f} MP/s ({nbytes} B)",
                flush=True,
            )
            if args.trace and rep == args.reps - 1:
                trace.set_enabled(False)
                trace.set_accumulate(False)
                tab = {k: v for k, v in trace.ACCUM.items()
                       if not k.startswith("n_")}
                print(f"  {path} stage totals (thread-seconds over "
                      f"{args.n} images; wall {dt:.1f} s):", flush=True)
                for k, v in sorted(tab.items(), key=lambda kv: -kv[1]):
                    n = trace.ACCUM.get("n_" + k, 0)
                    print(f"    {k:24s} {v:8.1f} s  "
                          f"({1e3 * v / max(n, 1):6.1f} ms x {n})",
                          flush=True)
        print(f"{path}: warm {total_mp / best:.2f} MP/s", flush=True)


if __name__ == "__main__":
    main()
