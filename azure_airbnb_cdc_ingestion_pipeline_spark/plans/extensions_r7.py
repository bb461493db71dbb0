"""Round-7 catalog extensions: perceptual image near-dup dedup.

Charter extension family (multimodal curation): visually-near-identical
image detection — the image-space analogue of the text near-dup stack
(minhash/simhash), built on the repo's own PNG codec and the shared
pigeonhole Hamming blocking (`operators.dedup.hamming_pairs`).

Corpus synthesis is a pure function of doc_id (the multimodal-key
pattern: the oracle predicts the outcome analytically): every 10th
document contributes a 256×256 grayscale PNG "photo" (smooth random
field, seeded by doc_id) plus four derived variants a real crawl
produces — brightness shift, tone-curve (gamma), down-up resample
("recompress"), and a 1-px border crop. The planted family structure IS
the expected dedup output: pHash + Hamming-≤6 blocking + connected
components must recover exactly {base, 4 variants} per family with the
base as canonical — no false splits (variants within the measured ≤6-bit
envelope), no false merges (distinct bases ≥ 12 bits apart, measured
over 2 000 families).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _t, query

_IMG = 256  # synthesized image edge; 1-px crop = 0.4 % shift ≤ 6 bits


def _synth_base(doc_id: int) -> np.ndarray:
    """Deterministic 256×256 grayscale 'photo': an 8×8 uniform random
    field (seeded by doc_id) bilinearly upsampled — smooth, low-frequency
    content like real photographs, re-generated identically at any SF."""
    from ..functions.phash import bilinear_resize

    rng = np.random.default_rng((doc_id * 0x9E3779B97F4A7C15) % (2**63))
    f = bilinear_resize(rng.uniform(0.0, 1.0, (8, 8)), _IMG, _IMG)
    f = (f - f.min()) / (f.max() - f.min() + 1e-12)
    # 40..210 range: headroom so the brightness variant never clips
    return (40 + f * 170).astype(np.uint8)


def _synth_family(doc_id: int) -> list[tuple[int, np.ndarray]]:
    """[(variant_idx, pixels)]: 0 = base, 1 = brightness +12,
    2 = gamma 1.08, 3 = down-up resample 96px, 4 = 1-px border crop."""
    from ..functions.phash import bilinear_resize

    base = _synth_base(doc_id)
    bright = np.clip(base.astype(np.int64) + 12, 0, 255).astype(np.uint8)
    gamma = np.clip(
        255.0 * (base.astype(np.float64) / 255.0) ** 1.08, 0, 255
    ).round().astype(np.uint8)
    resamp = np.round(
        bilinear_resize(bilinear_resize(base.astype(np.float64), 96, 96),
                        _IMG, _IMG)
    ).astype(np.uint8)
    crop = np.round(
        bilinear_resize(base[1:-1, 1:-1].astype(np.float64), _IMG, _IMG)
    ).astype(np.uint8)
    return [(0, base), (1, bright), (2, gamma), (3, resamp), (4, crop)]


def _image_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(media_id, payload): five real PNGs per contributing doc —
    media_id = doc_id·10 + variant. Synthesis is a map-only Arrow pass;
    payload bytes are born and hashed inside their partition, never
    shuffled."""
    from ..functions.codecs import encode_png
    from ..session import fan_out

    docs = fan_out(
        _t(spark, sf_dir, "documents").select("doc_id").filter(
            F.col("doc_id") % 10 == 0
        )
    )

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids, payloads = [], []
            for did in pdf["doc_id"]:
                for v, px in _synth_family(int(did)):
                    ids.append(int(did) * 10 + v)
                    payloads.append(
                        encode_png(_IMG, _IMG, 1, px.tobytes())
                    )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return docs.mapInPandas(gen, "media_id long, payload binary")


@query(
    "multimodal_phash_dedup",
    # The oracle predicts the full dedup outcome from the id scheme:
    # each family {doc_id·10 + 0..4} collapses to canonical doc_id·10.
    # Spark must RECOVER that structure from pixels alone — decode,
    # pHash, banded Hamming join, connected components.
    oracle="""
    SELECT doc_id * 10 + v AS media_id, doc_id * 10 AS canonical_id
    FROM documents, (SELECT unnest([0, 1, 2, 3, 4]) AS v)
    WHERE doc_id % 10 = 0
    """,
)
def q_multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup dedup (VERDICT r6 #5): PNG decode →
    pHash (DCT 8×8, median-thresholded, 63 bits) → pigeonhole-banded
    Hamming-≤6 pair join (lossless blocking: (7,1) single chunks below
    30 k images, (9,3) combination keys above — NEVER an all-pairs
    product) → min-label connected components. Scale posture: hashing is
    map-only over payload partitions; the pair join is keyed on band
    values with the exact-Hamming filter BEFORE the dedup shuffle; the
    only per-image shuffled state is (id, 63-bit fingerprint)."""
    from ..functions.phash import PHASH_BITS, phash_frame
    from ..operators.dedup import cluster_pairs, hamming_pairs
    from ..session import track_persist

    # persist the (id, fingerprint) frame — 16 B/row, the thing a real
    # pipeline materializes as a column. Its lineage is the expensive
    # map-only synth→encode→decode→DCT chain, consumed by the scheme
    # count, both sides of the band join, and the final canonical join;
    # without the persist each consumer replays the codec work.
    fps = track_persist(
        phash_frame(_image_corpus(spark, sf_dir), "media_id", "payload")
    )
    pairs = hamming_pairs(
        fps, "media_id", "phash", max_distance=6, num_bits=PHASH_BITS
    )
    clusters = cluster_pairs(pairs)
    # defensive: an image whose every variant-edge missed (cannot happen
    # inside the measured envelope) would be its own canonical, not a
    # dropped row
    return (
        fps.select("media_id")
        .join(clusters, fps.media_id == clusters.doc_id, "left")
        .select(
            "media_id",
            F.coalesce("canonical_id", "media_id").alias("canonical_id"),
        )
    )
