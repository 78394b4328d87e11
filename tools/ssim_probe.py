"""Matched-rate SSIM/PSNR probe for coefficient-level levers.

For each candidate config (env-knob settings), sweeps 3 qualities on the
two BD-gap images (photo, bench1024), PCHIP-interpolates SSIM and PSNR at
the BASE config's Q80 byte count, and prints the deltas. Fast inner loop
for hunting the lever that moves SSIM at matched rate (the BD-SSIM gap
lives on these images; tools/bdrate.py is the full verdict).

Usage: python tools/ssim_probe.py  (host path; ~minutes)
"""

import io
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, __file__.rsplit("/", 1)[0])

QUALITIES = (76, 84, 90)

CONFIGS = [
    ("base", {}),
    ("trellis-off", {"CAVIF_TPU_TRELLIS_CTX": "0"}),
    ("cdef-arb-off", {"CAVIF_TPU_CDEF_ARB": "0"}),
    ("psy-full-.5", {"CAVIF_TPU_PSY_FULL": "0.5"}),
]


def run_config(env):
    """Encode the probe images at the sweep qualities in a subprocess
    (env-derived constants are read at import); returns
    {img: [(bytes, psnr, ssim), ...]}."""
    code = r"""
import io, sys, json
import numpy as np
sys.path.insert(0, %r)
sys.path.insert(0, %r)
from PIL import Image
from ab_quality import images, gray, ssim
from cavif_tpu import Encoder

out = {}
for name, img in images():
    if name not in ("photo", "bench1024"):
        continue
    rows = []
    for q in %r:
        enc = Encoder.new().with_quality(q).with_speed(4)
        b = enc.encode_rgb(img).avif_file
        dec = np.asarray(Image.open(io.BytesIO(b)).convert("RGB")).astype(np.float64)
        err = ((dec - img.astype(np.float64)) ** 2).mean()
        p = 10 * np.log10(255**2 / max(err, 1e-9))
        s = ssim(gray(img.astype(np.float64)), gray(dec))
        rows.append((len(b), p, s))
    out[name] = rows
print(json.dumps(out))
""" % (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        os.path.dirname(os.path.abspath(__file__)),
        QUALITIES,
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        env={
            **os.environ,
            "JAX_PLATFORMS": "cpu",
            "CAVIF_TPU_DEVICE_SEARCH": "off",
            **env,
        },
    )
    assert r.returncode == 0, r.stderr[-2000:]
    import json

    return json.loads(r.stdout)


def main():
    from scipy.interpolate import PchipInterpolator

    results = {}
    for name, env in CONFIGS:
        results[name] = run_config(env)
        print(f"ran {name}", file=sys.stderr)

    base = results["base"]
    for img in base:
        ref_bytes = base[img][1][0]  # Q80 bytes of the base config
        print(f"--- {img} @ {ref_bytes} B (base Q80) ---")
        for name, _ in CONFIGS:
            rows = results[name][img]
            r = np.asarray([x[0] for x in rows], np.float64)
            p = np.asarray([x[1] for x in rows])
            s = np.asarray([x[2] for x in rows])
            i = np.argsort(r)
            lr = np.log10(r[i])
            fp = PchipInterpolator(lr, p[i])
            fs = PchipInterpolator(lr, s[i])
            x = np.log10(ref_bytes)
            x = min(max(x, lr.min()), lr.max())
            pp, ss = float(fp(x)), float(fs(x))
            if name == "base":
                bp, bs = pp, ss
                print(f"{name:12s} PSNR {pp:7.3f}  SSIM {ss:.5f}")
            else:
                print(
                    f"{name:12s} PSNR {pp:7.3f} ({pp-bp:+.3f})  "
                    f"SSIM {ss:.5f} ({ss-bs:+.5f})"
                )


if __name__ == "__main__":
    main()
