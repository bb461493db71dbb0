"""BPE realistic-merge-count scale leg (VERDICT r7 #2 done-condition):
train 1 024 merges + full corpus re-encode at two SFs and record wall
ratios.

The catalog keys gate correctness at 16 merges (the SQL-unrolled DuckDB
oracle's practical ceiling); the 1 024-merge behavior is pinned by the
frozen golden test (tests/test_bpe_r8.py). This leg proves the COST
story: the incremental trainer's driver loop is bounded by the distinct
word table (not the corpus), so train+encode wall must scale ~linearly
in corpus size — the encode's distinct-word Arrow pass and the token
stream join dominate.

Writes ``SCALE_r{N}_bpe1k.json``:
  {"merges": 1024, "legs": {sf: {train_sec, encode_sec, total_sec,
   n_docs, n_distinct_words, n_merges_learned}},
   "ratio": total_large / total_small, "k": data ratio,
   "flagged_superlinear": [...]}

Usage: python tools/bpe1k_scale.py --small .scale/sf1 --large .scale/sf10 \
         --out SCALE_r08_bpe1k.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MERGES = 1024


def leg(spark, sf_dir: str) -> dict:
    import duckdb

    from azure_airbnb_cdc_ingestion_pipeline_spark.functions.bpe import (
        bpe_doc_token_counts,
        train_bpe,
    )
    from azure_airbnb_cdc_ingestion_pipeline_spark.plans.queries import _t

    docs = _t(spark, sf_dir, "documents")
    t0 = time.time()
    merges = train_bpe(docs, num_merges=MERGES)
    train_sec = time.time() - t0
    t0 = time.time()
    bpe_doc_token_counts(docs, merges).write.format("noop").mode(
        "overwrite"
    ).save()
    encode_sec = time.time() - t0
    n_docs, n_words = duckdb.sql(
        f"""SELECT count(DISTINCT doc_id), count(DISTINCT w) FROM (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) w
            FROM read_parquet('{sf_dir}/documents.parquet')) WHERE w <> ''"""
    ).fetchone()
    return {
        "train_sec": round(train_sec, 2),
        "encode_sec": round(encode_sec, 2),
        "total_sec": round(train_sec + encode_sec, 2),
        "n_docs": n_docs,
        "n_distinct_words": n_words,
        "n_merges_learned": len(merges),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default=os.path.join(REPO, ".scale/sf1"))
    ap.add_argument("--large", default=os.path.join(REPO, ".scale/sf10"))
    ap.add_argument("--k", type=float, default=10.0)
    ap.add_argument("--out", default="SCALE_r08_bpe1k.json")
    args = ap.parse_args()

    from azure_airbnb_cdc_ingestion_pipeline_spark.session import get_spark

    spark = get_spark("bpe1k-scale")
    spark.sparkContext.setLogLevel("ERROR")
    small = leg(spark, os.path.abspath(args.small))
    large = leg(spark, os.path.abspath(args.large))
    ratio = round(large["total_sec"] / max(small["total_sec"], 1e-9), 2)
    flagged = ["bpe1k_train_encode"] if ratio > 1.3 * args.k else []
    result = {
        "merges": MERGES,
        "k": args.k,
        "legs": {args.small: small, args.large: large},
        "ratio_total": ratio,
        "flagged_superlinear": flagged,
    }
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
