"""Scale-validation bench (VERDICT r3 task #1): measure the headline suite
at two scale factors and record per-query wall-time scaling ratios.

Runs ``bench.py`` (same harness, same best-of-k timing) at the small and
large sf dirs back-to-back so host conditions are as comparable as the
shared VM allows, then writes ``SCALE_r{N}.json``:

    {"k": 10, "small": {...}, "large": {...},
     "ratios": {query: large_sec / small_sec},
     "flagged": [queries with ratio > 1.3 * k],
     "host": {calibration + steal for each run}}

A ratio near k is linear scaling; well below k means fixed overhead still
dominates at the large sf; above ``1.3 * k`` is flagged as superlinear
(the VERDICT threshold). Read flags against ``host_steal_pct`` — this VM
shows 2-10x per-query noise under load (BENCH_DIAG has the history).

Usage: python tools/scale_bench.py [--small /root/testdata/sf0.1]
         [--large /root/repo/.scale/sf1] [--k 10] [--out SCALE_r04.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf_dir: str, budget: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_BUDGET=budget,
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    last = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    if proc.returncode != 0 or not last:
        raise RuntimeError(
            f"bench failed at {sf_dir}: rc={proc.returncode}\n"
            f"{proc.stderr[-2000:]}"
        )
    return json.loads(last[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/root/testdata/sf0.1")
    ap.add_argument("--large", default=os.path.join(REPO, ".scale/sf1"))
    ap.add_argument("--k", type=float, default=10.0)
    ap.add_argument("--out", default=os.path.join(REPO, "SCALE_r04.json"))
    ap.add_argument("--budget-small", default="420")
    ap.add_argument("--budget-large", default="1800")
    args = ap.parse_args()

    print(f"== small sf: {args.small}", file=sys.stderr)
    small = run_bench(args.small, args.budget_small)
    print(f"   wall {small['value']}s", file=sys.stderr)
    print(f"== large sf: {args.large}", file=sys.stderr)
    large = run_bench(args.large, args.budget_large)
    print(f"   wall {large['value']}s", file=sys.stderr)

    ratios = {
        q: round(large["queries"][q] / t, 2)
        for q, t in small["queries"].items()
        if q in large["queries"] and t > 0
    }
    flagged = sorted(
        [q for q, r in ratios.items() if r > 1.3 * args.k],
        key=lambda q: -ratios[q],
    )
    out = {
        "k": args.k,
        "small_sf": small.get("sf"),
        "large_sf_dir": args.large,
        "small_wall": small["value"],
        "large_wall": large["value"],
        "wall_ratio": round(large["value"] / small["value"], 2),
        "ratios": dict(sorted(ratios.items(), key=lambda kv: -kv[1])),
        "flagged_superlinear": flagged,
        "small_queries": small["queries"],
        "large_queries": large["queries"],
        "host": {
            "small_calib_sec": small.get("host_calib_sec"),
            "small_steal_pct": small.get("host_steal_pct"),
            "large_calib_sec": large.get("host_calib_sec"),
            "large_steal_pct": large.get("host_steal_pct"),
        },
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in (
        "wall_ratio", "flagged_superlinear", "host")}))
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
