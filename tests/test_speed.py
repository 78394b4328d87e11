"""Speed preset matrix (av1encoder.rs:532-647; SURVEY.md section 2.2)."""

from cavif_tpu.av1.speed import SpeedTweaks, tile_count
from cavif_tpu.ops.quality import quality_to_quantizer


def test_default_q80_speed4():
    q = quality_to_quantizer(80.0)  # 121
    t = SpeedTweaks.from_preset(4, q)
    # low_quality = 121 < 153 -> True; high_quality = 121 > 121 -> False
    assert t.partition_range == (4, 16)
    assert t.reduced_tx_set is True
    assert t.rdo_tx_decision is True  # speed <= 4 and not high_quality
    assert t.encode_bottomup is False
    assert t.cdef is True  # low_quality and speed <= 9
    assert t.lrf is True  # low_quality and speed <= 8
    assert t.min_tile_size == 256


def test_high_quality_flags_inverted():
    q95 = quality_to_quantizer(95.0)  # 33 -> low_quality True, high_quality False
    t = SpeedTweaks.from_preset(1, q95)
    assert t.partition_range == (4, 64)
    q40 = quality_to_quantizer(40.0)  # 172 -> high_quality True (quality < 80)
    t2 = SpeedTweaks.from_preset(1, q40)
    # max_block_size capped at 16 when high_quality
    assert t2.partition_range == (4, 16)
    assert t2.min_tile_size == 2048 * 2


def test_speed_extremes():
    q = quality_to_quantizer(80.0)
    t10 = SpeedTweaks.from_preset(10, q)
    assert t10.partition_range == (16, 16)
    assert t10.tx_domain_rate is True
    assert t10.inter_tx_split is True
    assert t10.reduced_tx_set is True
    assert t10.fine_directional_intra is False
    assert t10.min_tile_size == 128
    t0 = SpeedTweaks.from_preset(0, q)
    assert t0.partition_range == (4, 64)
    assert t0.complex_prediction_modes is True
    assert t0.encode_bottomup is True
    assert t0.min_tile_size == 4096


def test_fast_deblock_needs_low_quality_flag():
    # fast_deblock = speed >= 7 and not high_quality
    q80 = quality_to_quantizer(80.0)
    assert SpeedTweaks.from_preset(7, q80).fast_deblock is True
    q40 = quality_to_quantizer(40.0)
    assert SpeedTweaks.from_preset(7, q40).fast_deblock is False


def test_tile_count_heuristic():
    # tiles = min(threads, W*H / min_tile_size^2) (av1encoder.rs:665-668)
    assert tile_count(4096, 4096, 8, 256) == 8
    assert tile_count(256, 256, 8, 256) == 1
    assert tile_count(100, 100, 8, 256) == 0
