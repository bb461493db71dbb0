"""Production-merge-count BPE evidence (VERDICT r8 #6): train 32 768
merges on the seeded 24 k-word rich corpus (the gated parquet corpus has
only 31 word forms — see tests/test_bpe_32k.py), record the driver
train wall and the frozen golden hash, and spot-check the
rank-scheduled segmenter against the naive reference under the full
table. Writes the JSON artifact given by --out.

Usage: python tools/bpe32k_golden.py --out BPE32K_r09.json
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MERGES = 32768


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import numpy as np

    from azure_airbnb_cdc_ingestion_pipeline_spark.functions.bpe import (
        _merge_loop_fast,
        bpe_ranks,
        bpe_segment,
        bpe_segment_reference,
    )
    from tests.test_bpe_32k import GOLDEN_32768, _rich32

    seg = _rich32()
    t0 = time.time()
    merges = _merge_loop_fast(dict(seg), MERGES)
    train_sec = time.time() - t0
    h = hashlib.md5(repr(merges).encode()).hexdigest()

    ranks = bpe_ranks(merges)
    rng = np.random.default_rng(7)
    words = ["".join(t) for t in list(seg)[:40]] + [
        "".join(
            rng.choice(list("abcdefghijklmnop"), size=int(rng.integers(1, 24)))
        )
        for _ in range(40)
    ]
    t0 = time.time()
    seg_ok = all(
        bpe_segment(w, merges, ranks) == bpe_segment_reference(w, merges)
        for w in words
    )
    spot_sec = time.time() - t0

    out = {
        "merges": MERGES,
        "n_distinct_words": len(seg),
        "train_sec": round(train_sec, 3),
        "golden_hash": h,
        "golden_match": h == GOLDEN_32768,
        "segmenter_spot_checks": len(words),
        "segmenter_parity_ok": bool(seg_ok),
        "segmenter_spot_sec": round(spot_sec, 3),
        "pass": h == GOLDEN_32768 and bool(seg_ok),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0 if out["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
