"""8K single-image steady-state measurement (BASELINE.json config #5).

Synthesizes a 7680x4320 photographic-noise image, encodes once cold
(compile) then N steady reps, and prints MP/s per rep plus the median.
Pass --trace for the per-stage breakdown of one rep.

Usage: python tools/bench8k.py [--reps 3] [--trace]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def img8k():
    """bench.py's photo-like generator at 8K, so stage breakdowns are
    content-comparable with the 1 MP headline runs."""
    import bench

    return bench._test_image(4320, 7680)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--trace", action="store_true")
    args = ap.parse_args()

    from cavif_tpu import Encoder

    img = img8k()
    mp = img.shape[0] * img.shape[1] / 1e6

    def enc():
        e = Encoder.new().with_quality(80).with_speed(4)
        return e.encode_rgb(img).avif_file

    t0 = time.time()
    b = enc()
    print(f"cold: {time.time()-t0:.1f} s  bytes {len(b)}")
    rates = []
    for i in range(args.reps):
        t0 = time.time()
        b = enc()
        dt = time.time() - t0
        rates.append(mp / dt)
        print(f"rep {i}: {dt:.2f} s  {mp/dt:.2f} MP/s")
    print(f"median {np.median(rates):.2f} MP/s  bytes {len(b)}")
    if args.trace:
        from cavif_tpu.utils import trace

        trace.set_enabled(True)
        trace.set_accumulate(True)
        t0 = time.time()
        enc()
        dt = time.time() - t0
        tab = {k: v for k, v in trace.ACCUM.items()
               if not k.startswith("n_")}
        trace.set_enabled(False)
        trace.set_accumulate(False)
        print(f"traced rep: {dt:.2f} s")
        for k, v in sorted(tab.items(), key=lambda kv: -kv[1])[:12]:
            print(f"  {k:20s} {v:7.2f} s")


if __name__ == "__main__":
    main()
