"""Paired-control adjudication of the r8→r9 sub-second bench drift
(r9 verdict task #4): run the drift set and two stable controls
back-to-back in ONE session at sf0.1, several alternating passes, and
print per-query best wall plus the ratio to each official record —
normalized by the controls' own ratio, which isolates box contention
from plan change.  Prints one JSON line per query and a markdown table
for SURVEY §6.

Usage: PYTHONPATH=. python tools/drift_control.py [--passes 3]
"""

from __future__ import annotations

import argparse
import gc
import json
import subprocess
import time

DRIFT = [
    "corpus_report", "quantile_sketch", "cms_estimate", "hll_overlap",
    "source_overlap", "chat_assembly_sessions",
]
CONTROLS = ["unshipped_events", "pricing_summary"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    r8 = json.loads(
        subprocess.run(
            ["git", "show", "7538fcb:BENCH_DETAIL.json"],
            capture_output=True, text=True, cwd="/root/repo",
        ).stdout
    )["queries"]
    r9 = json.load(open("/root/repo/BENCH_DETAIL.json"))["queries"]

    from paas_auditor_spark.session import get_spark
    from paas_auditor_spark.queries import REGISTRY

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    names = DRIFT + CONTROLS
    best: dict[str, float] = {n: float("inf") for n in names}
    for n in names:  # JVM warm-up pass, untimed
        REGISTRY[n].fn(spark, args.sf).write.format("noop").mode(
            "overwrite"
        ).save()
    for _ in range(args.passes):
        for n in names:
            t0 = time.perf_counter()
            REGISTRY[n].fn(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            best[n] = min(best[n], time.perf_counter() - t0)
            gc.collect()

    ctl_r8 = sum(best[c] for c in CONTROLS) / sum(r8[c] for c in CONTROLS)
    ctl_r9 = sum(best[c] for c in CONTROLS) / sum(r9[c] for c in CONTROLS)
    print(json.dumps({"control_ratio_vs_r8": round(ctl_r8, 3),
                      "control_ratio_vs_r9": round(ctl_r9, 3)}))
    print("\n| query | now (s) | r8 | r9 | now/r8 | now/r9 | now/r8 ctl-norm | now/r9 ctl-norm |")
    print("|---|---|---|---|---|---|---|---|")
    for n in names:
        b = round(best[n], 3)
        a8, a9 = r8.get(n), r9.get(n)
        row = [
            n, b, a8, a9,
            round(b / a8, 2) if a8 else "-",
            round(b / a9, 2) if a9 else "-",
            round(b / a8 / ctl_r8, 2) if a8 else "-",
            round(b / a9 / ctl_r9, 2) if a9 else "-",
        ]
        print("| " + " | ".join(str(x) for x in row) + " |")


if __name__ == "__main__":
    main()
