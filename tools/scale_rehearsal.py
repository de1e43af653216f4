"""sf0.1 → sf1 scaling rehearsal (r6 verdict task #2): run the most
expensive headline queries plus the dedup/ANN flagships at both scale
factors, measure wall-time scaling, and diff physical-plan shapes.

The claim under test: the engine's plans are SCALE-INVARIANT — 10× the
data changes partition counts and task sizes, never the plan shape (no
new Exchanges, pruning/broadcasts intact, no single-partition stages) —
and wall time grows ≈ linearly (ratio ≲ factor; sub-linear where fixed
scheduling overhead dominates at sf0.1).

Usage: PYTHONPATH=. python tools/scale_rehearsal.py
           [--small /root/testdata/sf0.1] [--big /root/repo/.scale/sf1]
           [--runs 2]
Prints one JSON line per query and a final markdown table for SURVEY §6.
"""

from __future__ import annotations

import argparse
import gc
import json
import re
import time

QUERIES = [
    # reference-parity ship path
    "unshipped_events",
    # TPC-H / relational
    "pricing_summary", "sessionization",
    # the most expensive headline queries (judge's r6 slowest list)
    "lm_perplexity", "lm_perplexity_interp", "bloom_decontaminate",
    "cdc_near_dup", "knn_ivfpq", "segment_dedup", "curation_pipeline",
    # dedup / ANN flagships
    "dedup_exact", "dedup_clusters_star", "semantic_dedup",
    "embedding_near_dup_lsh", "duplicate_spans", "bm25_search",
    # the r7 distributed-rank rewrites (formerly single-partition windows)
    "activity_gini", "traffic_pareto",
]

_NODE = re.compile(r"^[\s+:*!-]*([A-Za-z]+[A-Za-z0-9]*)\b")


def plan_shape(df) -> dict[str, int]:
    """Multiset of physical operator names (AQE initial plan) — the
    scale-invariance fingerprint."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    counts: dict[str, int] = {}
    for line in plan.splitlines():
        m = _NODE.match(line)
        if not m:
            continue
        name = m.group(1)
        if name in ("Input", "Output", "Arguments", "Condition",
                    "ReadSchema", "PushedFilters", "Location", "Batched",
                    "DataFilters", "PartitionFilters", "Format"):
            continue
        counts[name] = counts.get(name, 0) + 1
    return counts


def rehearse_probe(spark, fn, slice_dirs, slices, runs, query_label):
    """Build-then-probe scale curve shared by the probe rehearsal tools
    (ann/persisted): at each slice, run 1 pays the cached-artifact build
    through the registered query itself, subsequent runs are probe-only
    best-of-N, and the plan-shape fingerprint is diffed against the
    FIRST slice in ``slices`` (the labels follow it — a run that skips
    the smallest slice reports ratios against its own baseline, not a
    mislabeled sf0.1).  One JSON line per slice plus a markdown table
    for SURVEY §6; returns the result records."""
    import gc
    import json
    import time

    results, shapes = [], {}
    for name in slices:
        sf_dir = slice_dirs[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        build_s = round(time.perf_counter() - t0, 3)  # includes build
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            df = None
            gc.collect()
        shapes[name] = plan_shape(fn(spark, sf_dir))
        rec = {
            "query": query_label,
            "slice": name,
            "first_run_incl_build_s": build_s,
            "probe_s": round(best, 3),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    base = results[0]
    bname = base["slice"]
    print(f"\n### {query_label}")
    print(f"| slice | probe (warm) | vs {bname} | plan Δ vs {bname} |")
    print("|---|---|---|---|")
    for r in results:
        nm = r["slice"]
        diff = {
            k: (shapes[nm].get(k, 0), shapes[bname].get(k, 0))
            for k in set(shapes[nm]) | set(shapes[bname])
            if shapes[nm].get(k, 0) != shapes[bname].get(k, 0)
        }
        print(
            f"| {nm} | {r['probe_s']} s "
            f"| {round(r['probe_s'] / base['probe_s'], 2)}x "
            f"| {diff if diff else 'invariant'} |"
        )
    return results


def time_query(fn, spark, sf_dir: str, runs: int) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
        df = None
        gc.collect()
    return round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default="/root/repo/.scale/sf1")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--queries", default=None,
        help="comma-separated subset of the default query list",
    )
    ap.add_argument(
        "--headline", action="store_true",
        help="run bench.py's FULL headline list (r7 verdict task #6: "
        "every headline query measured at the 10x slice once, not just "
        "the expensive/flagship subset)",
    )
    args = ap.parse_args()
    if args.headline:
        import bench

        QUERIES[:] = bench.HEADLINE
    elif args.queries:
        QUERIES[:] = args.queries.split(",")

    from paas_auditor_spark.queries import REGISTRY
    from paas_auditor_spark.session import get_spark

    spark = get_spark(app_name="scale-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    rows = []
    for name in QUERIES:
        fn = REGISTRY[name].fn
        shape_s = plan_shape(fn(spark, args.small))
        shape_b = plan_shape(fn(spark, args.big))
        diff = {
            k: (shape_s.get(k, 0), shape_b.get(k, 0))
            for k in sorted(set(shape_s) | set(shape_b))
            if shape_s.get(k, 0) != shape_b.get(k, 0)
        }
        t_s = time_query(fn, spark, args.small, args.runs)
        t_b = time_query(fn, spark, args.big, args.runs)
        rec = {
            "query": name,
            "sf0.1_sec": t_s,
            "sf1_sec": t_b,
            "ratio": round(t_b / t_s, 2) if t_s else None,
            "plan_invariant": not diff,
            "plan_diff": diff,
        }
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    print("\n| query | sf0.1 s | sf1 s | ratio | plan |")
    print("|---|---|---|---|---|")
    for r in rows:
        mark = "=" if r["plan_invariant"] else "DIFF " + str(r["plan_diff"])
        print(
            f"| {r['query']} | {r['sf0.1_sec']} | {r['sf1_sec']} "
            f"| {r['ratio']} | {mark} |"
        )
    tot_s = round(sum(r["sf0.1_sec"] for r in rows), 1)
    tot_b = round(sum(r["sf1_sec"] for r in rows), 1)
    print(
        f"\ntotal: {args.small} {tot_s} s, {args.big} {tot_b} s, "
        f"ratio {round(tot_b / tot_s, 2)}"
    )


if __name__ == "__main__":
    main()
