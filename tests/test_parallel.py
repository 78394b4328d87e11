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
