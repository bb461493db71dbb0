"""r9 restart intervals (VERDICT r8 #2): DRI/RSTn per ITU-T T.81 E.2.4
— bit-identical decode vs the no-restart stream across every supported
profile, marker-sequence verification, predictor-reset correctness, and
the fail-loud contract for corrupted restart structure."""

import struct

import numpy as np
import pytest

from azure_airbnb_cdc_ingestion_pipeline_spark.functions.jpeg_codec import (
    decode_jpeg,
    encode_jpeg,
)
from azure_airbnb_cdc_ingestion_pipeline_spark.functions.phash import (
    bilinear_resize,
)


def _smooth_rgb(h: int, w: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    base = bilinear_resize(rng.uniform(40, 210, (8, 8)), h, w)
    return np.stack(
        [base, np.roll(base, 2, 0), np.roll(base, 3, 1)], -1
    ).astype(np.uint8)


@pytest.mark.parametrize("prog", [False, True])
@pytest.mark.parametrize("ss", ["444", "422", "420"])
@pytest.mark.parametrize("ri", [1, 2, 5])
def test_restart_decode_bit_identical_to_plain(prog, ss, ri):
    """DRI only adds markers + predictor resets — the quantized
    coefficients are unchanged, so the decode must be BIT-identical to
    the no-restart stream of the same pixels (any predictor-reset or
    alignment bug shifts whole post-restart blocks)."""
    h, w = 26, 37  # never an MCU multiple: partial MCUs cross restarts
    img = _smooth_rgb(h, w, seed=h * ri)
    ref = decode_jpeg(
        encode_jpeg(w, h, 3, img.tobytes(), progressive=prog, subsampling=ss)
    )
    dec = decode_jpeg(
        encode_jpeg(
            w, h, 3, img.tobytes(), progressive=prog, subsampling=ss,
            restart_interval=ri,
        )
    )
    assert dec["pixels"] == ref["pixels"]
    assert (dec["width"], dec["height"]) == (ref["width"], ref["height"])


def test_restart_grayscale_roundtrip():
    h, w = 17, 33
    rng = np.random.default_rng(3)
    gray = bilinear_resize(rng.uniform(40, 210, (4, 4)), h, w).astype(
        np.uint8
    )
    ref = decode_jpeg(encode_jpeg(w, h, 1, gray.tobytes()))
    dec = decode_jpeg(
        encode_jpeg(w, h, 1, gray.tobytes(), restart_interval=3)
    )
    assert dec["pixels"] == ref["pixels"]


def test_restart_stream_actually_contains_markers():
    img = _smooth_rgb(32, 32)
    enc = encode_jpeg(32, 32, 3, img.tobytes(), restart_interval=1)
    assert b"\xff\xdd" in enc  # DRI segment
    # 16 MCUs at 4:4:4 (4x4 of 8px) => 15 restart markers, cycling 0..7
    count = sum(enc.count(bytes([0xFF, 0xD0 + m])) for m in range(8))
    assert count >= 15


def test_out_of_sequence_restart_raises():
    enc = encode_jpeg(16, 16, 3, bytes(16 * 16 * 3), restart_interval=1)
    pos = enc.find(b"\xff\xd0")
    bad = enc[:pos] + b"\xff\xd3" + enc[pos + 2 :]
    with pytest.raises(ValueError, match="out of sequence"):
        decode_jpeg(bad)


def test_missing_restart_marker_raises():
    """Strip the first RSTn: the decoder expects one at the boundary
    and must fail loudly, not resync silently."""
    img = _smooth_rgb(32, 32, seed=5)
    enc = encode_jpeg(32, 32, 3, img.tobytes(), restart_interval=1)
    pos = enc.find(b"\xff\xd0")
    bad = enc[:pos] + enc[pos + 2 :]
    with pytest.raises(ValueError):
        decode_jpeg(bad)


def test_truncated_dri_segment_raises():
    enc = encode_jpeg(16, 16, 3, bytes(16 * 16 * 3), restart_interval=2)
    pos = enc.find(b"\xff\xdd")
    # shrink the DRI body to 1 byte (declared len 3: marker len field
    # counts itself) — structurally truncated
    bad = enc[:pos] + b"\xff\xdd" + struct.pack(">H", 3) + b"\x00" + enc[pos + 6 :]
    with pytest.raises(ValueError):
        decode_jpeg(bad)


def test_restart_interval_larger_than_image_is_inert():
    img = _smooth_rgb(24, 24, seed=11)
    ref = decode_jpeg(encode_jpeg(24, 24, 3, img.tobytes()))
    dec = decode_jpeg(
        encode_jpeg(24, 24, 3, img.tobytes(), restart_interval=9999)
    )
    assert dec["pixels"] == ref["pixels"]


def test_bad_restart_interval_param():
    with pytest.raises(ValueError):
        encode_jpeg(8, 8, 1, bytes(64), restart_interval=-1)
    with pytest.raises(ValueError):
        encode_jpeg(8, 8, 1, bytes(64), restart_interval=1 << 16)
