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


def _image_corpus(
    spark: SparkSession, sf_dir: str, hashes: bool = False
) -> DataFrame:
    """(media_id, payload): five real PNGs per contributing doc —
    media_id = doc_id·10 + variant. Synthesis is a map-only Arrow pass;
    payload bytes are born and hashed inside their partition, never
    shuffled.

    ``hashes=True`` (r10 optimization, guide §8/§4): emit
    (media_id, phash) directly — the SAME encode_png → decode_gray →
    phash64 chain runs per payload, but inside ONE Python stage, so the
    payload bytes never cross the JVM↔Python boundary at all and only
    one Python worker per task slot is live (the chained
    corpus→phash_frame pair ran 64 workers on 32 cores). 8 B/row leaves
    the stage instead of ~40 KB/row."""
    from ..functions.codecs import encode_png
    from ..session import fan_out

    docs = fan_out(
        _t(spark, sf_dir, "documents").select("doc_id").filter(
            F.col("doc_id") % 10 == 0
        )
    )
    if hashes:
        from ..functions.phash import decode_gray, phash64

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
    from ..functions.phash import PHASH_BITS
    from ..operators.dedup import cluster_pairs, hamming_pairs
    from ..session import track_persist

    # persist the (id, fingerprint) frame — 16 B/row, the thing a real
    # pipeline materializes as a column. Its lineage is the expensive
    # map-only synth→encode→decode→DCT chain, consumed by the scheme
    # count, both sides of the band join, and the final canonical join;
    # without the persist each consumer replays the codec work.
    # hashes=True fuses synth→encode→decode→pHash into ONE Python stage
    # (r10: payload bytes never reach the JVM; same codec chain, same
    # fingerprints — phash_frame parity pinned in tests/test_phash.py).
    fps = track_persist(_image_corpus(spark, sf_dir, hashes=True))
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


# ---------------------------------------------------------------------------
# r7: tokenizer-true BPE — vocab, encoded lengths, packing parity
# (VERDICT r6 #6). The DuckDB oracle re-trains the SAME BPE end-to-end
# in pure SQL: merge rounds are unrolled as generated CTEs; each round
# counts adjacent symbol pairs (occurrence-weighted) over the current
# segmentation, picks argmax with the (count DESC, l ASC, r ASC) total
# order, and applies the merge via fixpoint `replace` on the
# boundary-padded segment string (' a b ' → ' ab ', 4 passes). The
# fixpoint-replace application equals the greedy left-to-right scan for
# every word without a ≥5-run of one symbol — no such word exists in
# this corpus, and the hash gate would fail loudly if one appeared.
# ---------------------------------------------------------------------------

_BPE_MERGES = 16


def _bpe_sql(num_merges: int = _BPE_MERGES, vocab_cap: int = 65536) -> str:
    """Round-unrolled BPE training as a WITH-clause body (no leading
    WITH): exposes `tok(doc_id, w)`, `seg{N}(w, freq, seg)` and
    `bpe_vocab(rank, lhs, rhs, merged)`.

    r8 (advisor): the oracle mirrors `train_bpe`'s deterministic
    `vocab_cap` — pair statistics (`pairs{{k}}`) count only the top-K
    (freq DESC, w ASC) word forms, exactly the table the Spark trainer
    collects, while the learned merges still APPLY to every word
    (`seg{{k}}` is uncapped — matching the Spark encode path, which
    segments all distinct words). Inert at gated SFs (vocab ≪ cap) but
    the contract now fails loudly on BOTH sides if a corpus crosses it."""
    parts = [
        f"""
    tok AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        FROM documents
      ) WHERE w <> ''
    ),
    wf AS MATERIALIZED (SELECT w, count(*) AS freq FROM tok GROUP BY w),
    wfc AS MATERIALIZED (
      SELECT w FROM wf ORDER BY freq DESC, w ASC LIMIT {vocab_cap}
    ),
    seg0 AS MATERIALIZED (
      SELECT w, freq,
             ' ' || array_to_string(
               list_transform(generate_series(1, length(w)), i -> w[i]),
               ' ') || ' ' AS seg
      FROM wf
    )"""
    ]
    for k in range(1, num_merges + 1):
        p = k - 1
        parts.append(f"""
    pairs{k} AS MATERIALIZED (
      SELECT syms[i] AS l, syms[i + 1] AS r, sum(freq) AS c
      FROM (
        SELECT freq, syms, unnest(generate_series(1, len(syms) - 1)) AS i
        FROM (SELECT freq, string_split(trim(seg), ' ') AS syms
              FROM seg{p} JOIN wfc USING (w))
        WHERE len(syms) >= 2
      ) GROUP BY 1, 2
    ),
    best{k} AS MATERIALIZED (
      SELECT l, r, ' ' || l || ' ' || r || ' ' AS pat,
             ' ' || l || r || ' ' AS rep
      FROM pairs{k} ORDER BY c DESC, l ASC, r ASC LIMIT 1
    ),
    seg{k} AS MATERIALIZED (
      SELECT s.w, s.freq,
             CASE WHEN b.l IS NULL THEN s.seg ELSE
               replace(replace(replace(replace(s.seg,
                 b.pat, b.rep), b.pat, b.rep), b.pat, b.rep), b.pat, b.rep)
             END AS seg
      FROM seg{p} s LEFT JOIN best{k} b ON true
    )""")
    ranks = "\n      UNION ALL\n".join(
        f"      SELECT {k} AS rank, l AS lhs, r AS rhs, l || r AS merged "
        f"FROM best{k}"
        for k in range(1, num_merges + 1)
    )
    parts.append(f"""
    bpe_vocab AS (
{ranks}
    )""")
    return ",".join(parts)


def _trained_merges(spark: SparkSession, sf_dir: str):
    from ..functions.bpe import train_bpe

    return train_bpe(
        _t(spark, sf_dir, "documents"), "text", num_merges=_BPE_MERGES
    )


@query(
    "text_bpe_vocab",
    oracle=f"""
    WITH {_bpe_sql()}
    SELECT rank, lhs, rhs, merged FROM bpe_vocab
    """,
)
def q_text_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge table itself, hash-gated against the SQL
    re-training: distributed (word, freq) sufficient statistic →
    driver-bounded merge loop (`functions.bpe.train_bpe`)."""
    from ..functions.bpe import bpe_merges_frame

    return bpe_merges_frame(spark, _trained_merges(spark, sf_dir))


@query(
    "text_bpe_encode",
    oracle=f"""
    WITH {_bpe_sql()},
    lens AS (
      SELECT w, len(string_split(trim(seg), ' ')) AS n FROM seg{_BPE_MERGES}
    )
    SELECT t.doc_id, count(*) AS n_words,
           sum(n)::BIGINT AS n_bpe_tokens
    FROM tok t JOIN lens USING (w)
    GROUP BY t.doc_id
    """,
)
def q_text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True per-doc subword counts under the trained merges. The Spark
    side re-ENCODES (merges applied in rank order per distinct word —
    an independent path from the oracle, which reads the final training
    segmentation; the two agree by the standard rank-order/training
    equivalence), then joins lengths back and aggregates per doc."""
    from ..functions.bpe import bpe_doc_token_counts

    merges = _trained_merges(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents")
    out = bpe_doc_token_counts(docs, merges)
    return out.select("doc_id", "n_words", "n_bpe_tokens")


@query(
    "sequence_pack_bpe",
    # sequence_pack_chunks on TRUE subword counts: same md5-shard
    # prefix-sum packing, budget 512 BPE tokens per chunk.
    oracle=f"""
    WITH {_bpe_sql()},
    lens AS (
      SELECT w, len(string_split(trim(seg), ' ')) AS n FROM seg{_BPE_MERGES}
    ),
    dtok AS (
      SELECT t.doc_id, sum(n)::BIGINT AS n_tok
      FROM tok t JOIN lens USING (w) GROUP BY t.doc_id
    ),
    c AS (
      SELECT doc_id,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT % 8
                 AS shard,
             n_tok
      FROM dtok
    )
    SELECT doc_id, shard, n_tok,
           CAST(floor(
             COALESCE(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             / 512) AS INT) AS chunk_id
    FROM c
    """,
)
def q_sequence_pack_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing parity on tokenizer-true counts (VERDICT r6 #6 'done'
    condition): identical plan shape to `sequence_pack_chunks` — hash
    shards, per-shard prefix sums, no global ORDER BY — but the running
    sum is over real BPE token counts, so chunk boundaries are the ones
    a trainer consuming this tokenizer would see."""
    from pyspark.sql import Window

    from ..functions.bpe import bpe_doc_token_counts
    from ..functions.splits import split_bucket

    merges = _trained_merges(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents")
    counts = bpe_doc_token_counts(docs, merges).select(
        "doc_id",
        split_bucket("doc_id", 8).alias("shard"),
        F.col("n_bpe_tokens").cast("long").alias("n_tok"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return counts.select(
        "doc_id",
        "shard",
        "n_tok",
        F.floor(F.coalesce(F.sum("n_tok").over(w), F.lit(0)) / 512)
        .cast("int")
        .alias("chunk_id"),
    )
