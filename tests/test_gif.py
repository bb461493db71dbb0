"""GIF codec (r10, VERDICT r9 #7): GIF-LZW round trips, interlace,
real-world decoder compatibility, and the phash format-sniff path."""

import numpy as np
import pytest

from azure_airbnb_cdc_ingestion_pipeline_spark.functions.codecs import (
    _gif_lzw_decode,
    _gif_lzw_encode,
    decode_gif,
    encode_gif,
    gif_info,
)
from azure_airbnb_cdc_ingestion_pipeline_spark.functions.phash import (
    decode_gray,
    phash64,
)


def _round_trip(px: np.ndarray, interlace: bool = False) -> np.ndarray:
    h, w = px.shape
    payload = encode_gif(w, h, 1, px.tobytes(), interlace=interlace)
    d = decode_gif(payload)
    assert (d["width"], d["height"], d["channels"]) == (w, h, 1)
    return np.frombuffer(bytes(d["pixels"]), dtype=np.uint8).reshape(h, w)


@pytest.mark.parametrize("interlace", [False, True])
def test_round_trip_shapes(interlace):
    rng = np.random.default_rng(11)
    for w, h in [(1, 1), (7, 3), (33, 1), (64, 64), (65, 63)]:
        px = rng.integers(0, 256, (h, w), dtype=np.uint8)
        assert (_round_trip(px, interlace) == px).all()


def test_round_trip_12bit_table_and_clear():
    # 400x400 noise forces the LZW table to 4096 entries and the
    # clear-code reset path on both sides
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (400, 400), dtype=np.uint8)
    assert (_round_trip(px) == px).all()


def test_lzw_kwkwk_case():
    # 'aaaa...' exercises code == len(table) (the KwKwK case) immediately
    data = bytes([5]) * 50
    enc = _gif_lzw_encode(data, 8)
    assert bytes(_gif_lzw_decode(enc, 8, 50)) == data
    # and compresses: run-length input beats 1 byte/pixel
    assert len(enc) < 50


def test_gif_info_and_malformed():
    g = encode_gif(4, 2, 1, bytes(8))
    assert gif_info(g) == (4, 2, 256)
    with pytest.raises(ValueError):
        gif_info(b"NOTGIF" + bytes(20))
    with pytest.raises(ValueError):
        decode_gif(g[:20])  # truncated: no image descriptor / short LZW
    with pytest.raises(NotImplementedError):
        encode_gif(2, 2, 3, bytes(12))  # color encode unsupported, loudly


def test_real_world_gifs_decode():
    """Cross-validate the LZW width schedule against GIFs written by
    real encoders (the tk/IDLE icon set shipped with CPython)."""
    import glob

    paths = sorted(
        glob.glob(
            "/mnt/sandboxing/model_tools_env/v1/python/install/"
            "lib/python3.11/idlelib/Icons/*.gif"
        )
    )
    if not paths:
        pytest.skip("no real-world GIF fixtures on this host")
    for p in paths[:6]:
        d = decode_gif(open(p, "rb").read())
        assert d["width"] > 0 and d["height"] > 0
        assert len(d["pixels"]) == d["width"] * d["height"] * d["channels"]
        assert 0.0 <= d["mean_intensity"] <= 1.0


def test_phash_format_blind_gif():
    # identical pixels through PNG vs GIF must hash identically (both
    # round-trip bit-exactly), interlaced GIF too
    from azure_airbnb_cdc_ingestion_pipeline_spark.functions.codecs import (
        encode_png,
    )

    rng = np.random.default_rng(21)
    px = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    h_png = phash64(decode_gray(encode_png(64, 64, 1, px.tobytes())))
    h_gif = phash64(decode_gray(encode_gif(64, 64, 1, px.tobytes())))
    h_gil = phash64(
        decode_gray(encode_gif(64, 64, 1, px.tobytes(), interlace=True))
    )
    assert h_png == h_gif == h_gil


def test_flat_lzw_parity_and_fallback():
    # r10 optimization: the flat-code encoder and the vectorized literal
    # decode fast path must be pixel-identical to the dictionary pair on
    # the same plane, across clear-group boundaries and tiny sizes
    from azure_airbnb_cdc_ingestion_pipeline_spark.functions import codecs as C

    rng = np.random.default_rng(33)
    for npx in [0, 1, 254, 255, 256, 3838, 3839, 3840, 7679, 65536]:
        px = rng.integers(0, 256, npx, dtype=np.uint8).tobytes()
        flat = C._gif_lzw_encode_flat(px, 8)
        # fast path decodes the flat stream
        fast = C._gif_lzw_decode_flat(flat, 8, npx)
        assert fast is not None and bytes(fast) == px
        # the general scalar loop decodes it identically (conformance)
        orig = C._gif_lzw_decode_flat
        C._gif_lzw_decode_flat = lambda *a: None
        try:
            assert bytes(C._gif_lzw_decode(flat, 8, npx)) == px
        finally:
            C._gif_lzw_decode_flat = orig
        # dictionary streams fall back to the scalar loop unchanged
        dic = C._gif_lzw_encode(px, 8)
        assert bytes(C._gif_lzw_decode(dic, 8, npx)) == px
    # whole-file parity: flat vs dictionary GIFs decode identically
    px = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    for interlace in (False, True):
        a = C.decode_gif(
            encode_gif(64, 64, 1, px.tobytes(), interlace=interlace)
        )
        b = C.decode_gif(
            encode_gif(
                64, 64, 1, px.tobytes(), interlace=interlace, compress=False
            )
        )
        assert bytes(a["pixels"]) == bytes(b["pixels"]) == px.tobytes()


def test_flat_lzw_end_code_width_at_bump_boundary():
    # r11 (advisor): when npix lands so that the final partial clear
    # group ends EXACTLY at a width-bump offset (254/766/1790 into the
    # group at min_code_size 8), a spec decoder bumps the width after
    # the last literal and reads the END code at the NEW width. The
    # strict reader below demands the explicit end code right after the
    # last pixel (internal decoders stop at npix and never caught this).
    import numpy as np

    from azure_airbnb_cdc_ingestion_pipeline_spark.functions import codecs as C

    def strict_spec_read(data: bytes, mcs: int):
        clear, end = 1 << mcs, (1 << mcs) + 1
        width, tlen = mcs + 1, end + 1
        bitpos, out = 0, []
        buf = np.frombuffer(bytes(data) + b"\x00\x00", dtype=np.uint8)
        while True:
            b0 = bitpos >> 3
            u = int(buf[b0]) | (int(buf[b0 + 1]) << 8) | (int(buf[b0 + 2]) << 16)
            c = (u >> (bitpos & 7)) & ((1 << width) - 1)
            bitpos += width
            if c == end:
                return bytes(out)
            if c == clear:
                width, tlen = mcs + 1, end + 1
                continue
            assert c < clear, "dictionary code in a flat stream"
            out.append(c)
            tlen += 1
            if width < 12 and tlen == (1 << width) + 1:
                # spec: bump when the NEXT entry would not fit — i.e.
                # table size reached 2^width (tlen counts entries + 1
                # here because the first literal adds no entry)
                width += 1

    rng = np.random.default_rng(5)
    group = 4096 - 258 + 1  # literals per clear group at mcs=8
    sizes = [254, 766, 1790, group + 254, 255, 253, group, group + 1]
    for npx in sizes:
        px = rng.integers(0, 256, npx, dtype=np.uint8).tobytes()
        flat = C._gif_lzw_encode_flat(px, 8)
        # internal decoders still roundtrip
        assert bytes(C._gif_lzw_decode(flat, 8, npx)) == px
        # and a strict spec reader consumes the whole stream incl. END
        assert strict_spec_read(flat, 8) == px
