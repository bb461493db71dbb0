"""Round-8 catalog extensions: real-world JPEG profiles reach the
image pipeline.

VERDICT r7 #1: 4:2:0 chroma subsampling is the overwhelming majority of
any web-scraped image corpus, and before r8 those payloads degraded to
the metadata walk (`jpeg_codec` raised NotImplementedError on any
sampling factor ≠ 1×1; `phash_frame` only ingested PNG) — image
near-dup dedup was blind to real-world JPEG. r8 adds the interleaved-
MCU baseline decode (4:2:0 / 4:2:2, bilinear chroma upsample), the
matching encoder (so the corpus can synthesize the profile), and
format-sniffing pHash ingestion. Two oracle-gated keys pin it:

- `multimodal_jpeg420_roundtrip`: bit-exact subsampled decode on
  gray-valued color JPEGs (see key docstring for why exactness holds).
- `multimodal_phash_dedup_mixed`: the r7 perceptual-dedup flagship
  over a MIXED PNG / JPEG-420 / JPEG-422 corpus — families must
  collapse across the format boundary, which fails loudly if the MCU
  raster order, plane geometry, or chroma upsample is wrong (measured
  envelope: JPEG-420 re-encode ≤ 2 flipped pHash bits, crop+420 ≤ 4,
  gamma PNG ≤ 4 — vs ≥ 22 across distinct families at 2 000 families).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _t, query


@query(
    "multimodal_jpeg420_roundtrip",
    # Gray-VALUED 3-channel JPEGs decode bit-exactly through the
    # subsampled pipeline: r=g=b=v gives Cb=Cr=128.0 exactly (the
    # BT.601 chroma coefficients sum to zero), so both chroma planes
    # are constant 128 — box-decimation, DCT (DC-only), quantization
    # (0), and bilinear upsample all preserve that exactly — and the
    # luma plane is constant v with DC step (v−128)/2, exact for even
    # v. Dimensions are NOT MCU-multiples, so edge-padded partial MCUs
    # and the crop-then-upsample geometry are on the gated path.
    oracle="""
    SELECT doc_id AS media_id,
           12 + doc_id % 21 AS width,
           10 + doc_id % 17 AS height,
           3 AS channels,
           CAST(20 + 2 * (doc_id % 100) AS DOUBLE) AS mean_intensity
    FROM documents
    """,
)
def q_multimodal_jpeg420_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Chroma-subsampled JPEG decode under the oracle gate (VERDICT r7
    #1): synthesize a constant gray-valued COLOR JPEG per doc — doc_id
    mod 4 selects baseline-4:2:0 / baseline-4:2:2 / PROGRESSIVE-4:2:0 /
    progressive-4:2:2 (late r8: the progressive interleaved-MCU DC scan
    + per-component extent-grid AC scans decode bit-identically to
    baseline, so the same analytic oracle gates all four profiles) — at
    dims (12+id%21) × (10+id%17) (never a multiple of 16 ⇒ every image
    exercises partial MCUs), decode through the `decode_features` Arrow
    stage, and emit decoded dimensions and mean intensity. Same
    scan-speed-linear shape as `multimodal_jpeg_roundtrip`: two narrow
    mapInPandas passes, payload bytes never shuffle."""
    from ..functions.jpeg_codec import encode_jpeg
    from ..operators.multimodal import decode_features
    from ..session import fan_out

    # fan_out: the codec work (Python entropy coder) dominates; spread
    # the synth+decode Arrow passes across every core, not the scan's
    # file-partition count
    docs = fan_out(_t(spark, sf_dir, "documents").select("doc_id"))

    def _synth(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 12 + did % 21, 10 + did % 17
                v = 20 + 2 * (did % 100)
                px = np.full((h, w, 3), v, dtype=np.uint8)
                payloads.append(
                    encode_jpeg(
                        w, h, 3, px.tobytes(),
                        subsampling="420" if did % 2 == 0 else "422",
                        progressive=bool(did % 4 >= 2),
                        # r9 (VERDICT r8 #2): a third of each profile
                        # carries restart intervals (1- or 2-MCU DRI —
                        # every image is small, so both values produce
                        # many RSTn boundaries incl. partial-MCU edges)
                        restart_interval=(0, 1, 2)[did % 3],
                        # r9: a fifth of the BASELINE images use the
                        # non-interleaved per-component scan layout
                        interleave=not (did % 4 < 2 and did % 5 == 4),
                    )
                )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = docs.mapInPandas(_synth, "media_id long, payload binary").select(
        "media_id",
        "payload",
        F.struct(
            F.lit("image/jpeg").alias("mime"),
            F.lit("synth").alias("source"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )
    return decode_features(media).select(
        "media_id", "width", "height", "channels", "mean_intensity"
    )


def _mixed_image_corpus(
    spark: SparkSession, sf_dir: str, hashes: bool = False
) -> DataFrame:
    """(media_id, payload): five images per contributing doc spanning
    the PNG/JPEG format boundary — media_id = doc_id·10 + variant:
    0 = base PNG, 1 = JPEG-4:2:0 re-encode of base (the 'recompressed
    by a CDN' copy), 2 = JPEG-4:2:2 re-encode of the brightness
    variant, 3 = PROGRESSIVE JPEG-4:2:0 re-encode of the 1-px-crop
    variant (late r8 — progressive decodes bit-identically to baseline,
    so its pHash distance envelope is the crop+420 one), 4 = gamma-curve
    PNG, 5 = RESTART-INTERVAL (DRI=8) JPEG-4:2:0 re-encode of the
    down-up-resample variant (r9, VERDICT r8 #2 — 256 MCUs per image ⇒
    31 RSTn boundaries each; a broken predictor reset shifts every
    post-restart DC level and splits the family), 6 = GIF89a re-encode
    of base (r10, VERDICT r9 #7 — the identity gray palette + GIF-LZW
    round trip is bit-exact, so a correct decoder hashes it 0 bits from
    the base PNG, while a wrong LZW width schedule garbles the plane
    globally), 7 = INTERLACED GIF of the brightness variant (the 4-pass
    row shuffle must be undone — a missing deinterlace scrambles rows
    and splits the family), 8 = lossless WebP (VP8L) of base with
    subtract-green (r10, VERDICT r9 residual 3 — VP8L is bit-exact, so
    a correct decoder hashes it 0 bits from the base PNG; a wrong
    subtract-green inverse or prefix-code read garbles the plane
    globally; the full predictor/cache/LZ77 matrix is pinned by the
    unit fuzz, while the corpus profile rides the vectorized flat-code
    path on both sides — zero per-pixel Python at 100 TB), 9 =
    palette-mode WebP of the gamma variant (the color-indexing inverse
    on the web-graphics path). Synthesis is a map-only Arrow pass;
    payloads are born and hashed inside their partition, never
    shuffled."""
    from ..functions.codecs import encode_gif, encode_png
    from ..functions.jpeg_codec import encode_jpeg
    from ..functions.webp_codec import encode_webp
    from ..session import fan_out
    from .extensions_r7 import _IMG, _synth_family

    # ``hashes=True`` (r10, guide §8/§4 — the same fusion the plain
    # pHash corpus got in extensions_r7): the SAME encode→sniff→decode→
    # pHash chain runs per payload, but inside ONE Python stage, so the
    # ~40 KB payloads never cross the JVM↔Python boundary into a second
    # worker pool; 8 B/row leaves the stage.
    if hashes:
        from ..functions.phash import decode_gray, phash64

    docs = fan_out(
        _t(spark, sf_dir, "documents").select("doc_id").filter(
            F.col("doc_id") % 10 == 0
        )
    )

    def _jpeg(
        px: np.ndarray, ss: str, progressive: bool = False, ri: int = 0
    ) -> bytes:
        rgb = np.repeat(px[:, :, None], 3, axis=2)
        return encode_jpeg(
            _IMG, _IMG, 3, rgb.tobytes(), subsampling=ss,
            progressive=progressive, restart_interval=ri,
        )

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids, payloads = [], []
            for did in pdf["doc_id"]:
                fam = dict(_synth_family(int(did)))
                variants = [
                    encode_png(_IMG, _IMG, 1, fam[0].tobytes()),
                    _jpeg(fam[0], "420"),
                    _jpeg(fam[1], "422"),
                    _jpeg(fam[4], "420", progressive=True),
                    encode_png(_IMG, _IMG, 1, fam[2].tobytes()),
                    _jpeg(fam[3], "420", ri=8),
                    # flat-code LZW (r10 optimization): vectorized
                    # literal emission + the vectorized decode fast
                    # path — same decoded pixels (lossless either way,
                    # parity-tested in test_gif.py), ~10× less Python
                    # per image; width-bump/clear schedule and
                    # interlace still exercised
                    encode_gif(_IMG, _IMG, 1, fam[0].tobytes(),
                               compress=False),
                    encode_gif(_IMG, _IMG, 1, fam[1].tobytes(),
                               interlace=True, compress=False),
                    encode_webp(_IMG, _IMG, 1, fam[0].tobytes(),
                                subtract_green=True, use_lz77=False),
                    # a gray plane has <= 256 distinct colors by
                    # construction, so palette mode is always legal
                    encode_webp(_IMG, _IMG, 1, fam[2].tobytes(),
                                palette=True, use_lz77=False),
                ]
                for v, payload in enumerate(variants):
                    ids.append(int(did) * 10 + v)
                    payloads.append(payload)
            if hashes:
                yield pd.DataFrame(
                    {
                        "media_id": ids,
                        "phash": [
                            phash64(decode_gray(p)) for p in payloads
                        ],
                    }
                )
            else:
                yield pd.DataFrame({"media_id": ids, "payload": payloads})

    if hashes:
        return docs.mapInPandas(gen, "media_id long, phash long")
    return docs.mapInPandas(gen, "media_id long, payload binary")


@query(
    "multimodal_phash_dedup_mixed",
    # Identical analytic oracle shape to multimodal_phash_dedup: the id
    # scheme IS the expected dedup outcome; Spark must recover it from
    # pixels that now cross the PNG/JPEG-420/JPEG-422 format boundary.
    oracle="""
    SELECT doc_id * 10 + v AS media_id, doc_id * 10 AS canonical_id
    FROM documents, (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7, 8, 9]) AS v)
    WHERE doc_id % 10 = 0
    """,
)
def q_multimodal_phash_dedup_mixed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Perceptual near-dup dedup over a mixed-format corpus (VERDICT r7
    #1 done-condition): format-sniffed decode (PNG codec, the r8
    subsampled JPEG decode, the r10 GIF-LZW decode, or the r10 VP8L
    WebP decode) → pHash →
    pigeonhole-banded Hamming-≤6 pair join → min-label connected
    components — the same plan as `multimodal_phash_dedup`, now
    provably format-blind across all four major web image formats. A wrong MCU
    raster order / chroma geometry would perturb the decoded plane
    globally (≥ the cross-family 22-bit floor) and split every family
    containing a JPEG member; likewise a wrong DC-predictor reset at a
    restart boundary (variant 5 carries DRI=8) shifts every
    post-restart block's level and splits the family."""
    from ..functions.phash import PHASH_BITS
    from ..operators.dedup import cluster_pairs, hamming_pairs
    from ..session import track_persist

    # hashes=True fuses synth→encode→sniff→decode→pHash into ONE Python
    # stage (r10: payload bytes never reach the JVM; same codec chain,
    # same fingerprints — phash_frame parity pinned in tests/test_phash.py)
    fps = track_persist(_mixed_image_corpus(spark, sf_dir, hashes=True))
    pairs = hamming_pairs(
        fps, "media_id", "phash", max_distance=6, num_bits=PHASH_BITS
    )
    clusters = cluster_pairs(pairs)
    return (
        fps.select("media_id")
        .join(clusters, fps.media_id == clusters.doc_id, "left")
        .select(
            "media_id",
            F.coalesce("canonical_id", "media_id").alias("canonical_id"),
        )
    )
