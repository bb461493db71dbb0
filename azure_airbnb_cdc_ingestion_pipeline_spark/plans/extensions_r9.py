"""Round-9 catalog extensions: the last real-corpus JPEG metadata hole —
EXIF orientation.

Most camera JPEGs store pixels unrotated and carry the display rotation
as the APP1/TIFF 0x0112 tag; a pipeline that ignores it reports swapped
dimensions and mis-oriented pixels for every portrait photo.
`decode_jpeg` now parses the tag (both TIFF byte orders, degrade-to-0 on
malformed Exif — the pixels still decode) and applies the upright
transform; this key gates ALL EIGHT orientations with an analytic
oracle over constant 8×8 blocks (exact decode — the gray-valued even
value argument from `multimodal_jpeg420_roundtrip`), checking oriented
dimensions AND the top-left/bottom-right pixel values, which distinguish
every flip/rotation from every other."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _t, query

# Stored 16×24 block-value grid: B[by][bx] = 20 + 40·(3·by + bx) +
# 2·(doc%2), even values ⇒ bit-exact decode. After orienting upright the
# top-left / bottom-right pixels land on known corner blocks — the CASE
# tables in the oracle encode exactly those (3·by + bx) indices.


@query(
    "multimodal_exif_orientation",
    oracle="""
    WITH p AS (
      SELECT doc_id, 1 + doc_id % 8 AS o, 2 * (doc_id % 2) AS jit
      FROM documents
    )
    SELECT doc_id AS media_id,
           CASE WHEN o <= 4 THEN 24 ELSE 16 END AS width,
           CASE WHEN o <= 4 THEN 16 ELSE 24 END AS height,
           20 + 40 * (CASE o WHEN 1 THEN 0 WHEN 2 THEN 2 WHEN 3 THEN 5
                             WHEN 4 THEN 3 WHEN 5 THEN 0 WHEN 6 THEN 3
                             WHEN 7 THEN 5 ELSE 2 END) + jit AS top_left,
           20 + 40 * (CASE o WHEN 1 THEN 5 WHEN 2 THEN 3 WHEN 3 THEN 0
                             WHEN 4 THEN 2 WHEN 5 THEN 5 WHEN 6 THEN 2
                             WHEN 7 THEN 0 ELSE 3 END) + jit AS bottom_right
    FROM p
    """,
)
def q_multimodal_exif_orientation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXIF-orientation gate: synthesize a 24×16 six-block constant JPEG
    per doc with orientation tag 1 + doc%8, decode through decode_jpeg,
    and emit the ORIENTED dimensions plus the top-left / bottom-right
    luma — an analytic function of (orientation, doc parity) that fails
    for any wrong flip axis, rotation direction, or missed dim swap.
    Two narrow mapInPandas passes; payloads never shuffle."""
    from ..functions.jpeg_codec import decode_jpeg, encode_jpeg
    from ..session import fan_out

    docs = fan_out(_t(spark, sf_dir, "documents").select("doc_id"))

    def _run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids, ws, hs, tls, brs = [], [], [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                o = 1 + did % 8
                jit = 2 * (did % 2)
                g = np.zeros((16, 24), dtype=np.uint8)
                for by in range(2):
                    for bx in range(3):
                        g[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                            20 + 40 * (3 * by + bx) + jit
                        )
                rgb = np.repeat(g[:, :, None], 3, axis=2)
                d = decode_jpeg(
                    encode_jpeg(24, 16, 3, rgb.tobytes(), exif_orientation=o)
                )
                a = np.frombuffer(d["pixels"], np.uint8).reshape(
                    d["height"], d["width"], 3
                )
                ids.append(did)
                ws.append(d["width"])
                hs.append(d["height"])
                tls.append(int(a[0, 0, 0]))
                brs.append(int(a[-1, -1, 0]))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "width": ws,
                    "height": hs,
                    "top_left": tls,
                    "bottom_right": brs,
                }
            )

    return docs.mapInPandas(
        _run,
        "media_id long, width int, height int, "
        "top_left int, bottom_right int",
    ).select("media_id", "width", "height", "top_left", "bottom_right")
