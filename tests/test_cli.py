"""CLI black-box tests, mirroring the reference's tests/stdio.rs plus the
input-filtering/overwrite semantics of src/main.rs:136-200."""

import io
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

REPO = Path(__file__).resolve().parent.parent


def _png_bytes(w=64, h=40, alpha=False):
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(h, w, 4 if alpha else 3), dtype=np.uint8)
    # smooth it so encodes stay small/fast
    arr = (arr // 8 + 100).astype(np.uint8)
    if alpha:
        arr[..., 3] = 255
        arr[10:20, 10:30, 3] = 120
    img = Image.fromarray(arr, "RGBA" if alpha else "RGB")
    buf = io.BytesIO()
    img.save(buf, "PNG")
    return buf.getvalue()


def _run(args, input=None, cwd=None):
    return subprocess.run(
        [sys.executable, "-m", "cavif_tpu.cli", *args],
        input=input,
        capture_output=True,
        cwd=cwd or REPO,
        timeout=600,
    )


def test_stdio_roundtrip():
    """echo png | cavif - => AVIF on stdout with ftypavif magic
    (tests/stdio.rs:5-25)."""
    res = _run(["-", "--speed=10"], input=_png_bytes())
    assert res.returncode == 0, res.stderr.decode()
    assert res.stdout[4:12] == b"ftypavif"
    img = Image.open(io.BytesIO(res.stdout))
    img.load()


def test_path_to_stdout(tmp_path):
    """cavif file.png -o - writes a parsable AVIF to stdout
    (tests/stdio.rs:28-43)."""
    p = tmp_path / "in.png"
    p.write_bytes(_png_bytes(alpha=True))
    res = _run([str(p), "-o", "-", "--speed=10"])
    assert res.returncode == 0, res.stderr.decode()
    assert res.stdout[4:12] == b"ftypavif"
    img = Image.open(io.BytesIO(res.stdout))
    assert img.size == (64, 40)


def test_file_output_summary_and_overwrite(tmp_path):
    p = tmp_path / "photo.png"
    p.write_bytes(_png_bytes())
    res = _run([str(p), "--speed=10"])
    assert res.returncode == 0, res.stderr.decode()
    out = tmp_path / "photo.avif"
    assert out.exists()
    line = res.stdout.decode()
    assert "B color" in line and "B alpha" in line and "B HEIF" in line
    # overwrite guard: second run fails without -f
    res2 = _run([str(p), "--speed=10"])
    assert res2.returncode == 1
    assert "already exists" in res2.stderr.decode()
    # -f allows it
    res3 = _run([str(p), "--speed=10", "-f"])
    assert res3.returncode == 0, res3.stderr.decode()


def test_avif_input_filtering(tmp_path):
    existing = tmp_path / "done.avif"
    existing.write_bytes(b"x")
    res = _run([str(existing), "--speed=10"])
    # only input filtered out -> "No PNG/JPEG files specified", exit 1
    assert res.returncode == 1
    err = res.stderr.decode()
    assert "already an AVIF" in err
    assert "No PNG/JPEG files specified" in err


def test_quality_validation():
    res = _run(["-Q", "0", "-"])
    assert res.returncode != 0
    assert "quality must be in 1-100 range" in res.stderr.decode()


def test_cli_tune_flag(tmp_path):
    """--tune ssim (extension flag) produces a decodable AVIF that differs
    from the default psnr objective on mixed content."""
    import io

    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(5)
    y, x = np.mgrid[0:192, 0:192]
    smooth = (((x * 2 + y) // 3) % 256).astype(np.uint8)
    noisy = rng.integers(0, 255, (192, 192), dtype=np.uint8)
    lum = np.where(x < 96, smooth, noisy)
    img = np.stack([lum] * 3, axis=-1)
    src = tmp_path / "t.png"
    Image.fromarray(img).save(src)
    outs = {}
    for tune in ("psnr", "ssim"):
        out = tmp_path / f"{tune}.avif"
        res = _run([str(src), "-o", str(out), "--tune", tune,
                    "--quality", "87"])
        assert res.returncode == 0, res.stderr.decode()
        data = out.read_bytes()
        Image.open(io.BytesIO(data)).convert("RGB")
        outs[tune] = data
    assert outs["psnr"] != outs["ssim"]
