"""r8 chroma-subsampled JPEG (VERDICT r7 #1): 4:2:0 / 4:2:2 baseline
encode+decode through the interleaved-MCU path, bit-exactness on
gray-valued color images, the degrade contract for still-unsupported
profiles, and format-sniffed pHash ingestion."""

import numpy as np
import pytest

from azure_airbnb_cdc_ingestion_pipeline_spark.functions.jpeg_codec import (
    decode_jpeg,
    encode_jpeg,
)
from azure_airbnb_cdc_ingestion_pipeline_spark.functions.phash import (
    bilinear_resize,
    decode_gray,
    phash64,
)


def _smooth_rgb(h: int, w: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    base = bilinear_resize(rng.uniform(40, 210, (8, 8)), h, w)
    return np.stack(
        [base, np.roll(base, 2, 0), np.roll(base, 3, 1)], -1
    ).astype(np.uint8)


@pytest.mark.parametrize("ss", ["420", "422"])
@pytest.mark.parametrize("dims", [(64, 48), (67, 53)])
def test_subsampled_roundtrip_close(ss, dims):
    h, w = dims
    img = _smooth_rgb(h, w)
    dec = decode_jpeg(encode_jpeg(w, h, 3, img.tobytes(), subsampling=ss))
    assert (dec["width"], dec["height"], dec["channels"]) == (w, h, 3)
    out = np.frombuffer(dec["pixels"], np.uint8).reshape(h, w, 3)
    # q50 + subsampling keeps the image strongly correlated with the
    # source; a raster/MCU-order or plane-geometry bug decorrelates it.
    # (Absolute error is content-dependent: tiny images are high-
    # frequency relative to the 8px block, so thresholds on mean|err|
    # reject correct decodes — small dims are covered by the
    # gray-valued test below, where chroma decimation is inert.)
    corr = np.corrcoef(
        out.astype(float).ravel(), img.astype(float).ravel()
    )[0, 1]
    assert corr > 0.93, corr


@pytest.mark.parametrize("ss", ["420", "422"])
@pytest.mark.parametrize("dims", [(16, 16), (9, 11), (24, 17)])
def test_subsampled_small_dims_match_444_on_gray_content(ss, dims):
    """Partial-MCU geometry at tiny dims: with r=g=b content the chroma
    planes are constant 128 (decimation+upsample inert), so the
    subsampled decode must equal the 4:4:4 decode up to ±1 rounding —
    any MCU raster / plane-extent / upsample-crop bug shifts whole
    blocks instead."""
    h, w = dims
    rng = np.random.default_rng(h * 100 + w)
    gray = bilinear_resize(rng.uniform(40, 210, (4, 4)), h, w).astype(np.uint8)
    img = np.repeat(gray[:, :, None], 3, axis=2)
    d444 = decode_jpeg(encode_jpeg(w, h, 3, img.tobytes()))
    dsub = decode_jpeg(encode_jpeg(w, h, 3, img.tobytes(), subsampling=ss))
    a = np.frombuffer(d444["pixels"], np.uint8).astype(int)
    b = np.frombuffer(dsub["pixels"], np.uint8).astype(int)
    assert np.abs(a - b).max() <= 1, np.abs(a - b).max()


@pytest.mark.parametrize("ss", ["420", "422"])
def test_subsampled_constant_gray_valued_bit_exact(ss):
    # r=g=b=v (even v): Cb=Cr=128 exactly, luma DC step exact — the
    # analytic contract the multimodal_jpeg420_roundtrip oracle gates
    for v in (20, 118, 210):
        img = np.full((23, 37, 3), v, np.uint8)
        dec = decode_jpeg(encode_jpeg(37, 23, 3, img.tobytes(), subsampling=ss))
        assert (np.frombuffer(dec["pixels"], np.uint8) == v).all()
        assert dec["mean_intensity"] == float(v)


def test_subsampled_smaller_than_444():
    img = _smooth_rgb(64, 64)
    b444 = len(encode_jpeg(64, 64, 3, img.tobytes(), subsampling="444"))
    b420 = len(encode_jpeg(64, 64, 3, img.tobytes(), subsampling="420"))
    assert b420 < b444  # chroma really was decimated


def test_grayscale_ignores_subsampling():
    px = np.full((8, 16), 100, np.uint8)
    a = encode_jpeg(16, 8, 1, px.tobytes(), subsampling="420")
    b = encode_jpeg(16, 8, 1, px.tobytes(), subsampling="444")
    assert a == b
    assert decode_jpeg(a)["mean_intensity"] == 100.0


def test_unsupported_profiles_degrade_not_crash():
    img = _smooth_rgb(16, 16)
    with pytest.raises(NotImplementedError):
        encode_jpeg(16, 16, 3, img.tobytes(), subsampling="411")


@pytest.mark.parametrize("ss", ["420", "422", "444"])
def test_progressive_subsampled_decodes_identically_to_baseline(ss):
    """Late r8: progressive + subsampled (the second most common web
    profile) — the interleaved-MCU DC scan and per-component extent-grid
    AC scans must reconstruct the SAME coefficients as baseline, so the
    decoded pixels are bit-identical."""
    for dims in ((67, 53), (16, 16), (9, 11)):
        h, w = dims
        img = _smooth_rgb(h, w)
        b = decode_jpeg(encode_jpeg(w, h, 3, img.tobytes(), subsampling=ss))
        p = decode_jpeg(
            encode_jpeg(w, h, 3, img.tobytes(), subsampling=ss,
                        progressive=True)
        )
        assert b["pixels"] == p["pixels"], (ss, dims)


@pytest.mark.parametrize("ss", ["420", "422"])
def test_progressive_subsampled_constant_bit_exact(ss):
    img = np.full((23, 37, 3), 118, np.uint8)
    dec = decode_jpeg(
        encode_jpeg(37, 23, 3, img.tobytes(), subsampling=ss,
                    progressive=True)
    )
    assert (np.frombuffer(dec["pixels"], np.uint8) == 118).all()


def test_progressive_subsampled_truncation_raises_valueerror():
    img = _smooth_rgb(32, 32)
    enc = encode_jpeg(32, 32, 3, img.tobytes(), subsampling="420",
                      progressive=True)
    with pytest.raises(ValueError):
        decode_jpeg(enc[: len(enc) - 30])


def test_truncated_subsampled_scan_raises_valueerror():
    img = _smooth_rgb(32, 32)
    enc = encode_jpeg(32, 32, 3, img.tobytes(), subsampling="420")
    with pytest.raises(ValueError):
        decode_jpeg(enc[: len(enc) - 30])


def test_decode_gray_sniffs_png_and_jpeg():
    from azure_airbnb_cdc_ingestion_pipeline_spark.functions.codecs import (
        encode_png,
    )

    g = bilinear_resize(
        np.random.default_rng(3).uniform(40, 210, (8, 8)), 64, 64
    ).astype(np.uint8)
    png_gray = decode_gray(encode_png(64, 64, 1, g.tobytes()))
    assert png_gray.shape == (64, 64)
    rgb = np.repeat(g[:, :, None], 3, axis=2)
    jpg_gray = decode_gray(
        encode_jpeg(64, 64, 3, rgb.tobytes(), subsampling="420")
    )
    assert jpg_gray.shape == (64, 64)
    # perceptually the same image across the format boundary
    h1, h2 = phash64(png_gray), phash64(jpg_gray)
    assert bin((h1 ^ h2) & ((1 << 63) - 1)).count("1") <= 6
    with pytest.raises(ValueError):
        decode_gray(b"not an image at all")


def test_subsampled_vs_444_decode_agree_on_smooth_content():
    img = _smooth_rgb(48, 48, seed=11)
    d444 = decode_jpeg(encode_jpeg(48, 48, 3, img.tobytes()))
    d420 = decode_jpeg(encode_jpeg(48, 48, 3, img.tobytes(), subsampling="420"))
    a = np.frombuffer(d444["pixels"], np.uint8).astype(float)
    b = np.frombuffer(d420["pixels"], np.uint8).astype(float)
    assert np.abs(a - b).mean() < 6.0
