"""Probe-only factor-1000 datapoints for the REMAINING persisted probe
families (r10 verdict task #5): ``bloom_decontaminate_persisted`` and
``lm_perplexity_persisted`` at the sf0.1 / 10× / 100× / 1000× documents
slices — the same four-decade curve the gate
(tools/gate_probe_rehearsal.py), IVF and bm25
(tools/ann_probe_rehearsal.py) families already have.  Run 1 at each
slice builds the cached artifact (bloom words relation / finalized LM
model) through the registered query itself; subsequent runs are
probe-only best-of-N, and the plan-shape fingerprint is diffed across
slices so a scale-dependent plan flip is visible next to its cost.

Usage: PYTHONPATH=. python tools/persisted_probe_rehearsal.py
           [--queries bloom_decontaminate_persisted,lm_perplexity_persisted]
           [--slices sf0.1,sf1,sf10,sf100] [--runs 2]
"""

from __future__ import annotations

import argparse
import gc
import json
import time

from tools.scale_rehearsal import plan_shape

SLICE_DIRS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": "/root/repo/.scale/sf1",
    "sf10": "/root/repo/.scale/sf10",
    # documents-only factor-1000 slice (tools/make_scale_slice.py
    # --factor 1000 --tables documents) — both queries read documents
    "sf100": "/root/repo/.scale/sf100_docs",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--queries",
        default="bloom_decontaminate_persisted,lm_perplexity_persisted",
    )
    ap.add_argument("--slices", default="sf0.1,sf1,sf10,sf100")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from paas_auditor_spark.queries import REGISTRY
    from paas_auditor_spark.session import get_spark

    spark = get_spark(app_name="persisted-probe-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    for qname in args.queries.split(","):
        fn = REGISTRY[qname].fn
        results, shapes = [], {}
        for name in args.slices.split(","):
            sf_dir = SLICE_DIRS[name]
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            build_s = round(time.perf_counter() - t0, 3)  # includes build
            best = float("inf")
            for _ in range(args.runs):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
                df = None
                gc.collect()
            shapes[name] = plan_shape(fn(spark, sf_dir))
            rec = {
                "query": qname,
                "slice": name,
                "first_run_incl_build_s": build_s,
                "probe_s": round(best, 3),
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)

        base = results[0]
        print(f"\n### {qname}")
        print("| slice | probe (warm) | vs sf0.1 | plan Δ vs sf0.1 |")
        print("|---|---|---|---|")
        for r in results:
            nm = r["slice"]
            diff = {
                k: (shapes[nm].get(k, 0), shapes[base["slice"]].get(k, 0))
                for k in set(shapes[nm]) | set(shapes[base["slice"]])
                if shapes[nm].get(k, 0) != shapes[base["slice"]].get(k, 0)
            }
            print(
                f"| {nm} | {r['probe_s']} s "
                f"| {round(r['probe_s'] / base['probe_s'], 2)}x "
                f"| {diff if diff else 'invariant'} |"
            )


if __name__ == "__main__":
    main()
