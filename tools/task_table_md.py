"""Render TASK_AUDIT_r{N}.json as a markdown table appended to
PLANS_r{N}.md (VERDICT r7 #7: the 100x-cluster claim needs task-size
evidence, not just wall ratios).

Usage: python tools/task_table_md.py TASK_AUDIT_r08.json PLANS_r08.md
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    audit_path, md_path = sys.argv[1], sys.argv[2]
    d = json.load(open(audit_path))
    lines = [
        "",
        f"## Executor-posture audit ({d['sf_dir']})",
        "",
        "Per-query task-level metrics from the Spark UI REST API "
        f"(local[{d['cpus']}]; quantile 1.0 = the worst task). The",
        "100 TB contract: max task input comfortably under 1 GiB (tasks "
        "schedule on any executor profile), spill bounded, peak",
        "execution memory a fraction of a realistic executor heap.",
        "",
        "| query | wall (s) | stages | max task input (MB) | max task "
        "shuffle read (MB) | max task shuffle write (MB) | disk spill "
        "(MB, all tasks) | max task peak exec mem (MB) |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, r in d["queries"].items():
        lines.append(
            f"| {name} | {r['wall_sec']} | {r['stages']} | "
            f"{r['max_task_input_mb']} | {r['max_task_shuffle_read_mb']} | "
            f"{r['max_task_shuffle_write_mb']} | {r['sum_disk_spill_mb']} | "
            f"{r['max_task_peak_exec_memory_mb']} |"
        )
    with open(md_path, "a") as f:
        f.write("\n".join(lines) + "\n")
    print(f"appended {len(d['queries'])} rows to {md_path}")


if __name__ == "__main__":
    main()
