"""Batch (data-parallel) encoding: many images at once.

The reference gets file-level parallelism from rayon's global pool
(/root/reference/src/main.rs:223: files.into_par_iter()) with per-file
failure isolation. Here:

- encode_batch(): thread-pool fan-out over images. The encode pipeline
  releases the GIL in its native stages (tile serialization, block
  pipeline), so threads scale like the reference's rayon pool; failures are
  isolated per image and returned, not raised — the caller decides (the CLI
  prints them all and exits 1, like the reference).
- plane_mode_search_batch(): the device-side half for same-shaped batches —
  one pjit'd whole-plane mode search over a (data, tile) mesh; see
  ops/block_search.py and __graft_entry__.dryrun_multichip for the sharding
  wiring. Host tiles then serialize per image in the same pool.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np


@dataclass
class BatchResult:
    """Per-image outcome: exactly one of `encoded` / `error` is set."""

    index: int
    encoded: Optional[object] = None  # EncodedImage
    error: Optional[BaseException] = None


def _encode_one(enc, img: np.ndarray):
    """Top-level (picklable) per-image encode used by the process pool."""
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[2] == 4:
        return enc.encode_rgba(img)
    return enc.encode_rgb(img)


def encode_batch(
    images: Sequence[np.ndarray],
    encoder=None,
    max_workers: Optional[int] = None,
    processes: Optional[bool] = None,
) -> List[BatchResult]:
    """Encode a batch of (H, W, 3|4) uint8 images in parallel.

    Mirrors the reference's rayon fan-out semantics: every image is
    attempted, failures are collected per image (BatchResult.error), and
    results come back in input order.

    `processes` picks the fan-out: True forks a process pool (GIL-free —
    the encode pipeline's pass-2 serialization walk is Python, so thread
    fan-out alone caps at ~1 core of Python work), False uses threads, and
    None (default) auto-selects processes when the batch is big enough to
    amortize the fork and the platform supports it."""
    from .. import Encoder

    enc = encoder if encoder is not None else Encoder.new()
    workers = max_workers or (os.cpu_count() or 1)
    if enc.threads is None and len(images) > 1:
        # file-level parallelism replaces tile-level: one tile pipeline per
        # image avoids oversubscription (mirrors rayon's shared global pool)
        enc = enc.with_num_threads(1)

    def job(i: int) -> BatchResult:
        try:
            return BatchResult(index=i, encoded=_encode_one(enc, images[i]))
        except BaseException as e:  # per-image isolation
            return BatchResult(index=i, error=e)

    if len(images) <= 1:
        return [job(i) for i in range(len(images))]
    if processes is None:
        # device pass-1 pipelines best from threads (one jax client, the
        # chip overlaps the per-image uploads); forking with a live jax
        # runtime is also deadlock-prone
        processes = (
            len(images) >= 3 and _fork_ok() and not _device_engaged()
        )
    if processes and _fork_ok():
        return _encode_batch_procs(enc, images, min(workers, len(images)))
    if (
        len(images) >= 3
        and enc.device is None
        and _device_engaged()
    ):
        return _encode_batch_hybrid(enc, images, min(workers, len(images)))
    with ThreadPoolExecutor(max_workers=min(workers, len(images))) as ex:
        return list(ex.map(job, range(len(images))))


def _encode_batch_hybrid(enc, images, workers: int) -> List[BatchResult]:
    """Heterogeneous fan-out: the chip and the host cores encode DIFFERENT
    images concurrently. The device pass-1 round trip serializes on the
    attachment (~0.18 s/frame through a tunnel), so a handful of in-flight
    device-path encodes saturate the chip; every additional worker would
    just queue on it while host cores idle. Workers therefore race to
    acquire one of CAVIF_TPU_DEVICE_SLOTS device slots (default 5, the
    measured knee on a 4-core host) and
    fall back to the host cascade (`device="off"`) when none is free —
    total throughput approaches device MP/s + host MP/s instead of
    max(one of them). Both paths produce valid AVIFs; decision quality is
    measured at parity (BASELINE.md device-vs-host table)."""
    import threading
    from dataclasses import replace

    slots = int(os.environ.get("CAVIF_TPU_DEVICE_SLOTS", "5"))
    sem = threading.Semaphore(slots)
    host_enc = replace(enc, device="off")

    def job(i: int) -> BatchResult:
        got = sem.acquire(blocking=False)
        try:
            e = enc if got else host_enc
            return BatchResult(index=i, encoded=_encode_one(e, images[i]))
        except BaseException as exc:  # per-image isolation
            return BatchResult(index=i, error=exc)
        finally:
            if got:
                sem.release()

    with ThreadPoolExecutor(max_workers=workers) as ex:
        return list(ex.map(job, range(len(images))))


def _device_engaged() -> bool:
    dev = os.environ.get("CAVIF_TPU_DEVICE_SEARCH")
    if dev is not None:
        return dev not in ("", "0", "off", "none", "host")
    from ..av1.encoder import _device_backend_default

    return _device_backend_default()


def _child_disable_device() -> None:
    """Forked pool workers must not touch the device: the parent's jax
    runtime does not survive fork, and N workers would contend for the one
    chip. Each child encodes on the host path."""
    os.environ["CAVIF_TPU_DEVICE_SEARCH"] = "0"
    try:
        from ..av1 import encoder

        encoder._DEV_DEFAULT[0] = False
    except Exception:
        pass


def _fork_ok() -> bool:
    import multiprocessing

    return "fork" in multiprocessing.get_all_start_methods()


def _encode_batch_procs(enc, images, workers: int) -> List[BatchResult]:
    """Fork-based fan-out: one image per task, results reassembled by
    index. Forked children inherit the loaded native library and cached
    tables for free; per-task pickling moves only the input image (~MBs)
    and the output bytes."""
    import multiprocessing
    from concurrent.futures import ProcessPoolExecutor

    ctx = multiprocessing.get_context("fork")
    out: List[Optional[BatchResult]] = [None] * len(images)
    with ProcessPoolExecutor(
        max_workers=workers, mp_context=ctx, initializer=_child_disable_device
    ) as ex:
        futs = {
            ex.submit(_encode_one, enc, np.asarray(images[i])): i
            for i in range(len(images))
        }
        for f in futs:
            i = futs[f]
            try:
                out[i] = BatchResult(index=i, encoded=f.result())
            except BaseException as e:  # per-image isolation
                out[i] = BatchResult(index=i, error=e)
    return out


def encode_batch_sharded(
    images: Sequence[np.ndarray],
    encoder=None,
    mesh=None,
    max_workers: Optional[int] = None,
) -> List[bytes]:
    """Whole-batch encode with ONE sharded device pass-1 feeding per-image
    host serialization — the end-to-end (data = images, tile = block rows)
    scale-out path of SURVEY.md §2.4/§5.8.

    All images must be same-shaped (H, W, 3) uint8 RGB. The batched device
    program (ops/device_pass1.run_pass1_batch) computes every image's
    partition + mode decisions over the mesh in one call (replicated
    output: every process receives all grids, so multi-process runs
    produce byte-identical AVIFs to single-process ones); host threads
    then run pass 2 + EC + mux per image. Returns AVIF bytes per image.
    """
    from .. import Encoder
    from ..av1.config import AV1Config
    from ..av1.encoder import FrameEncoder
    from ..av1.speed import SpeedTweaks
    from ..ops import colorspace
    from ..ops.device_pass1 import run_pass1_batch
    from ..pipeline import _finish, _matrix_coefficients

    enc = encoder if encoder is not None else Encoder.new()
    imgs = [np.ascontiguousarray(np.asarray(im)[..., :3]) for im in images]
    if not imgs:
        return []
    h, w = imgs[0].shape[:2]
    assert all(im.shape == imgs[0].shape for im in imgs), "same-shape batch"
    depth = enc.output_depth.bits
    cfg = AV1Config(
        width=w, height=h, bit_depth=depth, quantizer=enc.quantizer,
        tweaks=SpeedTweaks.from_preset(enc.speed, enc.quantizer),
        chroma_sampling="444", full_range=True,
        matrix_coefficients=_matrix_coefficients(enc.color_model),
        threads=1, tune=enc.tune,
    )
    # scout: static geometry (padded dims, tile split, quantizers, lambda)
    scout = FrameEncoder(np.zeros((h, w, 3), np.int32), cfg)
    ph, pw = scout.planes[0].src.shape
    tcl, trl = scout._tile_split()
    sb_cols = (scout.mi_cols + 15) >> 4
    sb_rows = (scout.mi_rows + 15) >> 4
    th = ((sb_rows + (1 << trl) - 1) >> trl) * 64
    tw = ((sb_cols + (1 << tcl) - 1) >> tcl) * 64
    if scout.max_leaf_mi > 8:
        raise ValueError(
            "64px-leaf presets (speed<=1 low quality) use the host cascade"
        )
    batch = np.stack(
        [np.pad(im, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
         for im in imgs]
    )
    grids = run_pass1_batch(
        batch, depth=depth, tile_px=(th, tw),
        min_px=scout.min_leaf_mi * 4,
        use_deltas=cfg.tweaks.fine_directional_intra,
        dc_q=scout.dc_q, ac_q=scout.ac_q, lam=scout._lambda(),
        ovh_block=FrameEncoder.DEV_OVH_BLOCK, mesh=mesh,
    )

    def one(i: int) -> bytes:
        planes = colorspace.rgb_to_ycbcr_host(imgs[i], depth=depth)
        fe = FrameEncoder(planes, cfg, src8=imgs[i])
        fe._device_search = "inject"
        fe._dev_state = (grids[i], fe._dev_part_dict(grids[i]))
        color = fe.encode()
        return _finish(enc, color, None, w, h, depth).avif_file

    workers = min(len(imgs), max_workers or (os.cpu_count() or 1))
    with ThreadPoolExecutor(max_workers=workers) as ex:
        return list(ex.map(one, range(len(imgs))))


def plane_mode_search_batch(
    planes: np.ndarray,
    dc_q: int,
    ac_q: int,
    lam: float,
    bit_depth: int,
    mesh=None,
):
    """Device-side batched mode search over a batch of same-shaped planes,
    optionally sharded over a mesh (data axis = images, tile axis = block
    rows). planes: (N, H, W) int32 with H, W multiples of 32."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..ops.block_search import _kernel

    f = _kernel(32, bit_depth)
    args = (
        np.ascontiguousarray(planes, np.int32),
        np.float32(dc_q),
        np.float32(ac_q),
        np.float32(lam),
    )
    if mesh is not None:
        sh = NamedSharding(mesh, P("data", "tile", None))
        arr = jax.device_put(args[0], sh)
        return np.asarray(f(arr, *args[1:])[0])
    return np.asarray(f(*args)[0])
