"""Sweep the context-aware trellis strength (CAVIF_TPU_TRELLIS_CTX) on
the BD corpus and report BD-PSNR / BD-SSIM vs the libaom-s6 anchor for
each setting. Each strength runs in a fresh subprocess (the native
tilecoder caches env knobs statically); the libaom anchor sweep is
computed once and passed down.

Usage: python tools/trellis_sweep.py [u values...]
"""

import io
import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, __file__.rsplit("/", 1)[0])


def _child():
    """Encode the corpus at the current env's trellis setting; print
    one JSON line of per-image RD points."""
    from ab_quality import images
    from bdrate import _metrics
    from cavif_tpu import Encoder

    out = {}
    for name, img in images():
        pts = []
        for q in (40, 55, 65, 75, 85, 95):
            enc = Encoder.new().with_quality(q).with_speed(4)
            b = enc.encode_rgb(img).avif_file
            pts.append((len(b),) + _metrics(img, b))
        out[name] = pts
    print(json.dumps(out))


def main():
    if sys.argv[1:2] == ["--child"]:
        _child()
        return
    from PIL import Image

    from ab_quality import images
    from bdrate import _bd_quality, _bd_rate, _metrics

    # each arg is either a bare trellis strength ("1.2") or a comma-
    # separated env combo ("CAVIF_TPU_EOB_BITS=0.8,CAVIF_TPU_AC_BIAS=0.46")
    us = sys.argv[1:] or ["0", "0.3", "0.6", "0.9", "1.2"]
    anchors = {}
    for name, img in images():
        pts = []
        for q in (35, 45, 55, 65, 75, 90):
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="AVIF", quality=q, speed=6)
            pts.append((buf.tell(),) + _metrics(img, buf.getvalue()))
        anchors[name] = pts
    for u in us:
        env = {**os.environ, "CAVIF_TPU_TUNE": "psnr"}
        if "=" in u:
            for kv in u.split(","):
                k, _, v = kv.partition("=")
                env[k] = v
        else:
            env["CAVIF_TPU_TRELLIS_CTX"] = u
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child"],
            capture_output=True, env=env,
        )
        assert r.returncode == 0, r.stderr[-1500:]
        ours = json.loads(r.stdout.splitlines()[-1])
        bdp_all, bds_all, bdr_all = [], [], []
        for name, aom in anchors.items():
            pts = ours[name]
            r1, p1, s1 = (np.asarray([a[i] for a in aom]) for i in range(3))
            r2, p2, s2 = (np.asarray([o[i] for o in pts]) for i in range(3))
            bdp = _bd_quality(r1, p1, r2, p2)
            bds = _bd_quality(r1, s1, r2, s2)
            bdr = _bd_rate(r1, p1, r2, p2)
            fmt = lambda v, f: ("n/a" if v is None else f % v)
            print(f"  u={u} {name:10s} BD-PSNR {fmt(bdp, '%+.3f')} dB  "
                  f"BD-SSIM {fmt(bds, '%+.5f')}  BD-rate {fmt(bdr, '%+.1f')}%",
                  flush=True)
            if bdp is not None:
                bdp_all.append(bdp)
            if bds is not None:
                bds_all.append(bds)
            if bdr is not None:
                bdr_all.append(bdr)
        print(f"u={u} MEAN: BD-PSNR {np.mean(bdp_all):+.3f} dB  "
              f"BD-SSIM {np.mean(bds_all):+.5f}  "
              f"BD-rate {np.mean(bdr_all):+.1f}%", flush=True)


if __name__ == "__main__":
    main()
