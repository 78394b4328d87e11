"""Bjontegaard-delta comparison vs libaom on the synthetic corpus.

Sweeps this encoder (quality 40..95, speed given) and libaom (via Pillow's
AVIF plugin, quality 35..90, speed 6 — the common "good" preset) over the
ab_quality corpus, then reports BD-PSNR / BD-SSIM (quality delta at matched
bitrate, PCHIP-interpolated over log-rate, per the JVET recommendation) and
BD-rate (bitrate delta at matched quality) per image and averaged.

Positive BD-PSNR / BD-SSIM = this encoder is better at the same bits.
Negative BD-rate = this encoder needs fewer bits for the same quality.

Usage: python tools/bdrate.py [--speed 4] [--tune psnr|ssim]
"""

import argparse
import io
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, __file__.rsplit("/", 1)[0])

from PIL import Image

from ab_quality import gray, images, ssim


def _mono(r, q):
    """Sort by rate and drop duplicate-rate points (PCHIP needs strictly
    increasing x; quality sweeps can plateau in bytes)."""
    i = np.argsort(r)
    r, q = np.asarray(r)[i], np.asarray(q)[i]
    keep = np.concatenate([[True], np.diff(r) > 0])
    return r[keep], q[keep]


def _bd_quality(r1, q1, r2, q2):
    """BD quality delta (encoder 2 minus encoder 1) at matched rate:
    PCHIP interpolation over log10(rate), integrated on the overlap."""
    from scipy.interpolate import PchipInterpolator

    r1, q1 = _mono(r1, q1)
    r2, q2 = _mono(r2, q2)
    if len(r1) < 3 or len(r2) < 3:  # degenerate sweep (rate plateaus)
        return None
    lr1, lr2 = np.log10(r1), np.log10(r2)
    lo = max(lr1.min(), lr2.min())
    hi = min(lr1.max(), lr2.max())
    if hi - lo < 0.1:  # need >= ~26% rate-range overlap for a stable fit
        return None
    p1 = PchipInterpolator(lr1, q1)
    p2 = PchipInterpolator(lr2, q2)
    xs = np.linspace(lo, hi, 256)
    return float(np.mean(p2(xs) - p1(xs)))


def _bd_rate(r1, q1, r2, q2):
    """BD-rate (%) of encoder 2 vs encoder 1 at matched quality."""
    from scipy.interpolate import PchipInterpolator

    r1, q1 = np.asarray(r1), np.asarray(q1)
    r2, q2 = np.asarray(r2), np.asarray(q2)
    if len(r1) < 3 or len(r2) < 3:
        return None
    lo = max(q1.min(), q2.min())
    hi = min(q1.max(), q2.max())
    if hi - lo < 0.5:  # dB (or SSIM) overlap too thin for a stable fit
        return None
    keep1 = np.concatenate([[True], np.diff(np.sort(q1)) > 0])
    keep2 = np.concatenate([[True], np.diff(np.sort(q2)) > 0])
    i1s, i2s = np.argsort(q1), np.argsort(q2)
    r1, q1 = r1[i1s][keep1], q1[i1s][keep1]
    r2, q2 = r2[i2s][keep2], q2[i2s][keep2]
    if len(r1) < 3 or len(r2) < 3:
        return None
    p1 = PchipInterpolator(q1, np.log10(r1))
    p2 = PchipInterpolator(q2, np.log10(r2))
    xs = np.linspace(lo, hi, 256)
    return float((10 ** np.mean(p2(xs) - p1(xs)) - 1.0) * 100.0)


def _metrics(img, data):
    dec = np.asarray(Image.open(io.BytesIO(data)).convert("RGB")).astype(
        np.float64
    )
    err = ((dec - img.astype(np.float64)) ** 2).mean()
    p = 10 * np.log10(255**2 / max(err, 1e-9))
    s = ssim(gray(img.astype(np.float64)), gray(dec))
    return p, s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--speed", type=int, default=4)
    ap.add_argument("--tune", default="psnr")
    args = ap.parse_args()

    from cavif_tpu import Encoder

    bdp_all, bds_all, bdr_all = [], [], []
    for name, img in images():
        ours = []
        # dense sweeps: the quality->rate curve has preset kinks (the
        # low/high-quality flag flips at ~Q55/Q80 change cdef/lrf/partition
        # policy, mirroring the reference's thresholds), and 6-point PCHIP
        # over a kinked curve was measured to inflate |BD-SSIM| ~1.6x
        # against a 14-point sweep of the same build
        for q in range(40, 96, 4):
            enc = Encoder.new().with_quality(q).with_speed(
                args.speed
            ).with_tune(args.tune)
            b = enc.encode_rgb(img).avif_file
            ours.append((len(b),) + _metrics(img, b))
        aom = []
        for q in range(35, 91, 4):
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="AVIF", quality=q, speed=6)
            aom.append((buf.tell(),) + _metrics(img, buf.getvalue()))
        r1, p1, s1 = (np.asarray([a[i] for a in aom]) for i in range(3))
        r2, p2, s2 = (np.asarray([o[i] for o in ours]) for i in range(3))
        bdp = _bd_quality(r1, p1, r2, p2)
        bds = _bd_quality(r1, s1, r2, s2)
        # a degenerate rate sweep (edges-style plateau) makes the
        # quality->rate inverse meaningless too — skip BD-rate with it
        bdr = _bd_rate(r1, p1, r2, p2) if bdp is not None else None
        fmt = lambda v, f: ("n/a" if v is None else f % v)
        print(f"{name:10s} BD-PSNR {fmt(bdp, '%+.3f')} dB  "
              f"BD-SSIM {fmt(bds, '%+.5f')}  BD-rate {fmt(bdr, '%+.1f')}%")
        if bdp is not None:
            bdp_all.append(bdp)
        if bds is not None:
            bds_all.append(bds)
        if bdr is not None:
            bdr_all.append(bdr)
    if bdp_all:
        print(f"MEAN vs libaom-s6: BD-PSNR {np.mean(bdp_all):+.3f} dB  "
              f"BD-SSIM {np.mean(bds_all):+.5f}  "
              f"BD-rate {np.mean(bdr_all):+.1f}%")
    else:
        print("no overlapping sweeps")


if __name__ == "__main__":
    main()
