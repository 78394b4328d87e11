"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline (BASELINE.json): full AVIF encode MP/s at quality 80 / speed 4
(the reference's defaults: Q80 -> quantizer 121, 10-bit, 4:4:4 YCbCr
BT.601 full range; /root/reference/src/main.rs:54,60 and
ravif/src/av1encoder.rs:526-530).

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


def _libaom_anchor(img: np.ndarray, our_bytes: int):
    """Measured same-VM anchor: libaom speed 6 (via Pillow/libavif) encoding
    the same content at matched output size. cavif itself cannot run here
    (no Rust toolchain, no egress — BASELINE.md), so libaom-s6 is the
    measured stand-in; rav1e s4 (cavif's engine) is generally slower than
    libaom s6 at matched quality, so this anchor is conservative.

    Returns (libaom_mps, libaom_bytes, quality) or None if Pillow lacks
    AVIF support in this environment."""
    import io

    try:
        from PIL import Image
    except Exception:
        return None
    pim = Image.fromarray(img)
    try:
        # coarse sweep to find the quality whose size best matches ours
        sizes = {}
        for q in (45, 55, 65, 75):
            buf = io.BytesIO()
            pim.save(buf, format="AVIF", quality=q, speed=6)
            sizes[q] = buf.tell()
    except Exception:
        return None
    q = min(sizes, key=lambda k: abs(sizes[k] - our_bytes))
    times = []
    for _ in range(3):
        buf = io.BytesIO()
        t0 = time.perf_counter()
        pim.save(buf, format="AVIF", quality=q, speed=6)
        times.append(time.perf_counter() - t0)
    mp = img.shape[0] * img.shape[1] / 1e6
    return mp / min(times), sizes[q], q


def _test_image(h: int, w: int) -> np.ndarray:
    """Photo-like synthetic content: smooth shading + texture + edges."""
    rng = np.random.default_rng(42)
    y, x = np.mgrid[0:h, 0:w].astype(np.float64)
    base = (
        110 + 80 * np.sin(x / 97.0) * np.cos(y / 61.0)
        + 40 * np.sin((x + 2 * y) / 31.0)
    )
    texture = rng.normal(0.0, 6.0, size=(h, w))
    edges = 60.0 * ((x // 128 + y // 128) % 2)
    lum = np.clip(base + texture + edges * 0.3, 0, 255)
    r = np.clip(lum + 18 * np.sin(y / 83.0), 0, 255)
    b = np.clip(lum - 22 * np.cos(x / 71.0), 0, 255)
    return np.stack([r, lum, b], axis=-1).astype(np.uint8)


def main() -> None:
    from cavif_tpu import Encoder
    from cavif_tpu.parallel import encode_batch

    img = _test_image(1024, 1024)
    enc = Encoder.new().with_quality(80).with_speed(4)

    out = enc.encode_rgb(img)  # warmup: jit compiles, native build, pools
    enc.encode_rgb(img)

    # Shared/virtualized hosts show large run-to-run CPU-steal variance
    # (identical encodes measured 1.5-2x apart); the minimum over several
    # runs is the closest estimate of machine capability.
    times = []
    for _ in range(7):
        t0 = time.perf_counter()
        out = enc.encode_rgb(img)
        times.append(time.perf_counter() - t0)
    dt_single = min(times)

    # Batch throughput — the reference's primary operating mode is a rayon
    # par_iter over files ("the more images, the better", README.md:27);
    # encode_batch is our equivalent fan-out. Size the batch to the host so
    # many-core machines aren't capped by the batch length. With the device
    # pass-1 engaged (TPU default), oversubscribe the thread pool 2x so the
    # chip stays fed while workers are in their host (pass-2/EC) phases.
    import os

    from cavif_tpu.parallel.batch import _device_engaged

    ncpu = os.cpu_count() or 1
    device = _device_engaged()
    nimg = max(16 if device else 8, ncpu)
    workers = 2 * ncpu + 1 if device else None
    imgs = [
        np.ascontiguousarray(np.roll(img, 13 * i, axis=1))
        for i in range(nimg)
    ]
    bt = []
    for _ in range(4):
        t0 = time.perf_counter()
        res = encode_batch(imgs, enc, max_workers=workers)
        bt.append(time.perf_counter() - t0)
    assert all(r.encoded is not None for r in res)
    dt_batch = min(bt) / len(imgs)

    mp = img.shape[0] * img.shape[1] / 1e6
    mps = mp / min(dt_single, dt_batch)
    anchor = _libaom_anchor(img, len(out.avif_file))
    if anchor is not None:
        aom_mps, aom_bytes, aom_q = anchor
        measured = {
            "libaom_s6_mps": round(aom_mps, 3),
            "libaom_s6_bytes": aom_bytes,
            "libaom_s6_quality": aom_q,
            "vs_libaom_measured": round(mps / aom_mps, 3),
        }
    else:
        measured = {"vs_libaom_measured": None}
    print(
        json.dumps(
            {
                "metric": "encode_mps_q80_s4",
                "value": round(mps, 3),
                "unit": "MP/s",
                "vs_baseline": round(mps / REF_MPS, 3),
                **measured,
                "detail": {
                    "image": "1024x1024 synthetic photo-like RGB",
                    "avif_bytes": len(out.avif_file),
                    "seconds_per_image_single": round(dt_single, 4),
                    "seconds_per_image_batch": round(dt_batch, 4),
                    "batch_size": len(imgs),
                    "device_pass1": bool(device),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
