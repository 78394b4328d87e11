"""Batch-parallel encode: ordering, failure isolation, mesh search."""

import numpy as np

from cavif_tpu import Encoder
from cavif_tpu.parallel import encode_batch


def test_encode_batch_order_and_isolation():
    rng = np.random.default_rng(0)
    good = (rng.integers(0, 256, (40, 48, 3)) // 4 + 90).astype(np.uint8)
    bad = np.zeros((0, 0, 3), dtype=np.uint8)  # TooFewPixels
    res = encode_batch([good, bad, good], Encoder.new().with_speed(10))
    assert [r.index for r in res] == [0, 1, 2]
    assert res[0].encoded is not None and res[0].error is None
    assert res[1].error is not None and res[1].encoded is None
    assert res[2].encoded is not None
    assert res[0].encoded.avif_file[4:12] == b"ftypavif"


def test_pass1_hooks_scoped_per_context(monkeypatch):
    """The hybrid scheduler's device-slot hooks are per-call contextvar
    state: two threads (standing in for two concurrent encode_batch
    calls) each install their own hooks and must see exactly their own
    start/done pair — never the other call's (VERDICT r04 weak #6)."""
    import threading

    from cavif_tpu.ops import device_pass1

    spec = [((4, 4), "mode", (1, 1))]
    monkeypatch.setattr(
        device_pass1, "_program",
        lambda key: ((lambda *a: np.zeros(1, np.int8)), spec),
    )

    class Rec:
        def __init__(self):
            self.ev = []

        def start(self):
            self.ev.append("start")

        def done(self):
            self.ev.append("done")

    def run_with(rec):
        tok = device_pass1.PASS1_HOOKS.set(rec)
        try:
            device_pass1.run_pass1(
                np.zeros((64, 64), np.uint8), depth=8, model="mono",
                num_planes=1, tile_px=(64, 64), min_px=8,
                use_deltas=False, dc_q=8, ac_q=8, lam=1.0,
            )
        finally:
            device_pass1.PASS1_HOOKS.reset(tok)

    a, b = Rec(), Rec()
    ts = [threading.Thread(target=run_with, args=(r,)) for r in (a, b)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert a.ev == ["start", "done"]
    assert b.ev == ["start", "done"]
    # and the installing thread's own context is clean again
    assert device_pass1.PASS1_HOOKS.get() is None


def test_stream_threads_inherit_pass1_hooks(monkeypatch):
    """pipeline._encode_streams runs color/alpha on an inner executor;
    both stream threads must inherit the caller's PASS1_HOOKS so an RGBA
    encode's two device round trips stay under the hybrid scheduler's
    slot bound (ADVICE r04 medium: plain executor threads start with an
    empty context and escaped it)."""
    from cavif_tpu import Encoder, pipeline
    from cavif_tpu.av1 import encoder as enc_mod
    from cavif_tpu.ops import device_pass1

    seen = []

    def fake_encode_planes(planes, cfg, src8=None):
        seen.append(device_pass1.PASS1_HOOKS.get())
        return b"x"

    monkeypatch.setattr(enc_mod, "encode_planes", fake_encode_planes)
    hooks = object()
    tok = device_pass1.PASS1_HOOKS.set(hooks)
    try:
        pipeline._encode_streams(
            Encoder.new(), np.zeros((32, 32, 3), np.int32),
            np.zeros((32, 32), np.int32), 8,
        )
    finally:
        device_pass1.PASS1_HOOKS.reset(tok)
    assert seen == [hooks, hooks]


def test_mesh_batch_search():
    import jax
    from jax.sharding import Mesh

    from cavif_tpu.parallel import plane_mode_search_batch

    devs = np.array(jax.devices())
    n = 1 if len(devs) < 2 else 2
    mesh = Mesh(devs[: n * 1].reshape(n, 1), ("data", "tile"))
    rng = np.random.default_rng(1)
    planes = rng.integers(0, 1024, (n, 64, 64)).astype(np.int32)
    out = plane_mode_search_batch(planes, 499, 616, 30.0, 10, mesh=mesh)
    assert out.shape == (n, 2, 2)


def test_plane_partition_search_mesh():
    """The full device pass-1 (multi-tier search + partition DP) sharded
    over a (data, tile) mesh must equal the unsharded run exactly — the
    neighbor-shift halo exchange under GSPMD may not change any decision."""
    import jax
    from jax.sharding import Mesh

    from cavif_tpu.ops.block_search import plane_partition_search

    rng = np.random.default_rng(3)
    planes = rng.integers(0, 1024, (4, 128, 128)).astype(np.int32)
    t0, c0 = plane_partition_search(planes, 499, 616, 30.0, 10)
    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("data", "tile"))
    t1, c1 = plane_partition_search(planes, 499, 616, 30.0, 10, mesh=mesh)
    for n in t0:
        assert np.array_equal(t0[n][0], t1[n][0]), n
        assert np.allclose(t0[n][1], t1[n][1]), n
    for n in c0:
        assert np.array_equal(c0[n], c1[n]), n
