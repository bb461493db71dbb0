"""r9 JPEG profile extensions past the verdict's task list:
non-interleaved baseline scans (the last SOF0 layout hole) and EXIF
orientation (APP1/TIFF 0x0112 — the metadata most camera JPEGs carry)."""

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


# -- non-interleaved baseline ------------------------------------------------


@pytest.mark.parametrize("ss", ["444", "422", "420"])
@pytest.mark.parametrize("ri", [0, 2])
def test_noninterleaved_baseline_bit_identical(ss, ri):
    """Per-component full-band scans carry the same quantized
    coefficients, so the decode must be BIT-identical to the interleaved
    stream of the same pixels (wrong sub-grid extents or a shared DC
    predictor across scans shifts whole blocks)."""
    h, w = 26, 37
    img = _smooth_rgb(h, w)
    ref = decode_jpeg(encode_jpeg(w, h, 3, img.tobytes(), subsampling=ss))
    dec = decode_jpeg(
        encode_jpeg(
            w, h, 3, img.tobytes(), subsampling=ss, interleave=False,
            restart_interval=ri,
        )
    )
    assert dec["pixels"] == ref["pixels"]
    assert (dec["width"], dec["height"]) == (ref["width"], ref["height"])


def test_noninterleaved_stream_has_three_scans():
    enc = encode_jpeg(
        24, 16, 3, bytes(24 * 16 * 3), interleave=False
    )
    assert enc.count(b"\xff\xda") == 3


def test_noninterleaved_grayscale_is_single_scan():
    # 1-component frames have nothing to split; the classic path handles
    # them (ns == ncomp == 1)
    enc = encode_jpeg(24, 16, 1, bytes(24 * 16), interleave=False)
    ref = encode_jpeg(24, 16, 1, bytes(24 * 16))
    assert decode_jpeg(enc)["pixels"] == decode_jpeg(ref)["pixels"]


def test_baseline_component_scanned_twice_raises():
    enc = encode_jpeg(16, 16, 3, bytes(16 * 16 * 3), interleave=False)
    # duplicate the first SOS+scan: component 1 scanned twice
    first = enc.find(b"\xff\xda")
    second = enc.find(b"\xff\xda", first + 2)
    bad = enc[:second] + enc[first:second] + enc[second:]
    with pytest.raises(ValueError, match="scanned twice"):
        decode_jpeg(bad)


def test_baseline_missing_component_scan_raises():
    enc = encode_jpeg(16, 16, 3, bytes(16 * 16 * 3), interleave=False)
    # drop the LAST scan (component 3 never scanned)
    last = enc.rfind(b"\xff\xda")
    bad = enc[:last] + b"\xff\xd9"
    with pytest.raises(ValueError, match="cover every component"):
        decode_jpeg(bad)


# -- EXIF orientation --------------------------------------------------------


def _blocks_img() -> bytes:
    g = np.zeros((16, 24), dtype=np.uint8)
    for by in range(2):
        for bx in range(3):
            g[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = 20 + 40 * (
                3 * by + bx
            )
    return np.repeat(g[:, :, None], 3, axis=2).tobytes()


_EXPECT_TL = {1: 20, 2: 100, 3: 220, 4: 140, 5: 20, 6: 140, 7: 220, 8: 100}


@pytest.mark.parametrize("o", list(range(1, 9)))
def test_exif_orientation_all_eight(o):
    d = decode_jpeg(encode_jpeg(24, 16, 3, _blocks_img(), exif_orientation=o))
    assert (d["width"], d["height"]) == ((24, 16) if o <= 4 else (16, 24))
    a = np.frombuffer(d["pixels"], np.uint8).reshape(
        d["height"], d["width"], 3
    )
    assert int(a[0, 0, 0]) == _EXPECT_TL[o]
    # mean is rotation/flip-invariant
    ref = decode_jpeg(encode_jpeg(24, 16, 3, _blocks_img()))
    assert d["mean_intensity"] == ref["mean_intensity"]


def test_exif_little_endian_tiff_parses():
    """Hand-build an II (little-endian) APP1 — the writer emits MM, so
    this pins the other byte order."""
    enc = encode_jpeg(24, 16, 3, _blocks_img())
    tiff = (
        b"II\x2a\x00" + struct.pack("<I", 8)
        + struct.pack("<H", 1)
        + struct.pack("<HHI", 0x0112, 3, 1)
        + struct.pack("<HH", 6, 0)
        + struct.pack("<I", 0)
    )
    body = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
    with_exif = enc[:2] + app1 + enc[2:]
    d = decode_jpeg(with_exif)
    assert (d["width"], d["height"]) == (16, 24)  # rotated 90 CW
    a = np.frombuffer(d["pixels"], np.uint8).reshape(24, 16, 3)
    assert int(a[0, 0, 0]) == _EXPECT_TL[6]


def test_malformed_exif_degrades_to_unrotated():
    enc = encode_jpeg(24, 16, 3, _blocks_img())
    body = b"Exif\x00\x00" + b"XX" + b"\x00" * 6  # bogus byte order
    app1 = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
    d = decode_jpeg(enc[:2] + app1 + enc[2:])
    assert (d["width"], d["height"]) == (24, 16)  # tag ignored, no raise


def test_exif_composes_with_other_profiles():
    img = _smooth_rgb(26, 37, seed=9)
    ref = decode_jpeg(
        encode_jpeg(37, 26, 3, img.tobytes(), subsampling="420")
    )
    d = decode_jpeg(
        encode_jpeg(
            37, 26, 3, img.tobytes(), subsampling="420", progressive=False,
            restart_interval=2, interleave=False, exif_orientation=3,
        )
    )
    a = np.frombuffer(d["pixels"], np.uint8).reshape(26, 37, 3)
    r = np.frombuffer(ref["pixels"], np.uint8).reshape(26, 37, 3)
    assert np.array_equal(a, r[::-1, ::-1])  # rot180 of the plain decode


def test_bad_exif_orientation_param():
    with pytest.raises(ValueError):
        encode_jpeg(8, 8, 1, bytes(64), exif_orientation=9)
