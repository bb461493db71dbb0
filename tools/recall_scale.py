"""Recall-at-scale harness (VERDICT r7 #4): measure PLANTED-PAIR recall
— not just wall time — for the approximate ANN / near-dup paths at every
scale factor.

The catalog's recall keys are hash-gated at bench SFs (recall@1 = 1.0 by
construction); wall-time scale legs proved linearity at sf30/sf100 but
never re-measured recall there. This tool runs the four approximate
paths at each given SF and scores them against the analytically-known
planted structure:

- ``ann_lsh_recall`` / ``ann_ivf_recall`` / ``ann_int8_recall`` /
  ``ann_pq_recall``: 10 planted queries (vec_id < 10, +0.05 on coord 0);
  expected top-1 = the original vector. Floor 1.0 (the sizing contracts
  put per-query miss odds ≤ 2e-5).
- ``embedding_cosine_pairs`` (threshold-true leg): two planted families
  per corpus — near-dup (vec_id % 29 == 0 → id+100000, cos ≈ 0.9996)
  and midband (vec_id % 23 == 5 → id+1e9, cos = 0.96 exactly, inside
  the r7 at-threshold guarantee band). Family recall floors 0.999
  (closed-form 1e-4 per-pair miss budget; thousands of pairs at sf100).

Writes ``SCALE_r{N}_recall.json``:
    {"legs": {sf_name: {query: {wall, expected, found, recall}}},
     "floors": {...}, "pass": bool}

Usage:
  python tools/recall_scale.py --sfs /root/testdata/sf0.1 \
      .scale/sf1 .scale/sf10 .scale/sf30 .scale/sf100 \
      --out SCALE_r08_recall.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ANN_KEYS = ["ann_lsh_recall", "ann_ivf_recall", "ann_int8_recall",
            "ann_pq_recall"]
FLOORS = {
    "ann": 1.0,          # 10 planted queries, per-query miss <= 2e-5
    "pert": 0.999,       # cos~0.9996 family, 1e-4 per-pair budget
    "midband": 0.999,    # cos=0.96 family — the r7 at-threshold band
}


def planted_pairs(sf_dir: str) -> tuple[set, set]:
    import duckdb

    ids = duckdb.sql(
        f"SELECT vec_id FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchnumpy()["vec_id"]
    pert = {(int(i), int(i) + 100000) for i in ids if i % 29 == 0}
    # midband offset is 5e6 (r8): provably collision-free against the
    # scale generator's 1e7 replica stride at every replica count
    mid = {(int(i), int(i) + 5000000) for i in ids if i % 23 == 5}
    return pert, mid


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sfs", nargs="+", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--skip-pairs-above", type=int, default=10**9,
                    help="skip embedding_cosine_pairs legs beyond this "
                         "many corpus vectors")
    args = ap.parse_args()

    from azure_airbnb_cdc_ingestion_pipeline_spark.plans.queries import QUERIES
    from azure_airbnb_cdc_ingestion_pipeline_spark.session import (
        get_spark,
        release_persisted,
    )

    spark = get_spark("recall-scale")
    spark.sparkContext.setLogLevel("ERROR")

    legs: dict[str, dict] = {}
    ok = True
    for sf_dir in args.sfs:
        sf_dir = os.path.abspath(sf_dir)
        name = os.path.basename(sf_dir.rstrip("/"))
        leg: dict[str, dict] = {}
        import duckdb

        n_vec = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{sf_dir}/embeddings.parquet')"
        ).fetchone()[0]
        leg["n_vectors"] = n_vec
        for key in ANN_KEYS:
            t0 = time.time()
            rows = QUERIES[key](spark, sf_dir).collect()
            wall = round(time.time() - t0, 3)
            got = {(r.query_id, r.neighbor_id) for r in rows}
            found = sum(1 for i in range(10) if (i + 100000, i) in got)
            rec = found / 10.0
            leg[key] = {"wall": wall, "expected": 10, "found": found,
                        "recall": rec, "floor": FLOORS["ann"]}
            ok = ok and rec >= FLOORS["ann"]
            release_persisted()
            print(f"[{name}] {key}: recall {rec} wall {wall}s", flush=True)
        if n_vec <= args.skip_pairs_above:
            t0 = time.time()
            out = {
                (r.a_id, r.b_id)
                for r in QUERIES["embedding_cosine_pairs"](
                    spark, sf_dir
                ).collect()
            }
            wall = round(time.time() - t0, 3)
            pert, mid = planted_pairs(sf_dir)
            fp = len(pert & out)
            fm = len(mid & out)
            rp = fp / max(len(pert), 1)
            rm = fm / max(len(mid), 1)
            leg["embedding_cosine_pairs"] = {
                "wall": wall,
                "pert_expected": len(pert), "pert_found": fp,
                "pert_recall": round(rp, 6), "pert_floor": FLOORS["pert"],
                "midband_expected": len(mid), "midband_found": fm,
                "midband_recall": round(rm, 6),
                "midband_floor": FLOORS["midband"],
                "total_pairs_emitted": len(out),
            }
            ok = ok and rp >= FLOORS["pert"] and rm >= FLOORS["midband"]
            release_persisted()
            print(
                f"[{name}] embedding_cosine_pairs: pert {rp:.6f} "
                f"midband {rm:.6f} wall {wall}s", flush=True,
            )
        legs[name] = leg

    result = {"legs": legs, "floors": FLOORS, "pass": ok}
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"out": args.out, "pass": ok}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
