"""Optimization-round baseline capture (guide §1: measure first).

For every headline query: the bench's own best-of-2 noop-sink timing,
plus a build/execute split for the second (warm) pass, the Spark job
count the query schedules, and the ``explain("formatted")`` physical
plan written to ``plans/r11/<name>_<tag>.txt``.

Usage: python tools/opt_baseline.py [tag] [only,names,...]
  tag defaults to "before"; names default to the full HEADLINE list.
Writes /tmp/opt_<tag>.json with the per-query records.
"""

from __future__ import annotations

import contextlib
import gc
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else HEADLINE

    from paas_auditor_spark.queries import REGISTRY
    from paas_auditor_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_DIR", "r12"),
    )
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark(app_name=f"opt-{tag}")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    sc = spark.sparkContext

    # Subset runs: one untimed warm sweep first so JIT/codegen state
    # approximates mid-bench warmth (fresh-session best-of-2 is too noisy
    # to A/B single queries), then best-of-3 below.
    warm_sweep = len(names) < len(HEADLINE)
    if warm_sweep:
        for name in names:
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
    n_runs = 3 if warm_sweep else 2

    out: dict[str, dict] = {}
    for name in names:
        fn = REGISTRY[name].fn
        sc.setJobGroup(name, name)
        runs = []
        build_s = exec_s = 0.0
        df = None
        jobs_single = 0
        for _ in range(n_runs):
            jobs_before = len(sc.statusTracker().getJobIdsForGroup(name))
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            runs.append(t2 - t0)
            build_s, exec_s = t1 - t0, t2 - t1
            # per-execution job count (ADVICE r11: the old len-of-group
            # accumulated across all n_runs)
            jobs_single = (
                len(sc.statusTracker().getJobIdsForGroup(name)) - jobs_before
            )
        # plan AFTER the timed runs so plan compilation isn't double-paid
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        df = None
        gc.collect()
        rec = {
            "sec": round(min(runs), 3),
            "runs": [round(r, 3) for r in runs],
            "build2": round(build_s, 3),
            "exec2": round(exec_s, 3),
            "jobs": jobs_single,
        }
        out[name] = rec
        print(f"{name}: {rec}", flush=True)

    total = round(sum(r["sec"] for r in out.values()), 3)
    print(json.dumps({"tag": tag, "total": total, "n": len(out)}))
    with open(f"/tmp/opt_{tag}.json", "w") as fh:
        json.dump({"total": total, "queries": out}, fh, indent=1)


if __name__ == "__main__":
    main()
