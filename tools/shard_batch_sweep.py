"""Probe cost vs INGEST-BATCH size for the per-batch sharded probes
(`bloom_decontaminate_sharded` / `lm_perplexity_sharded` shapes) at a
fixed large corpus — the cost-model claim measured: per-batch wall =
FIXED term (bloom: O(m) literal assembly + pruned listing; LM: one
model map-scan) + a term linear in the batch, so quadrupling the batch
must move wall far less than 4× while the corpus term stays flat.

Batches are contiguous doc_id ranges inside copy 0 of the scale slice
(the slice maker shifts each copy by 1e9, so ranges ≤ the base corpus
size stay exact-count and row-group-prunable).

Usage: PYTHONPATH=. python tools/shard_batch_sweep.py
           [--sf-dir /root/repo/.scale/sf100_docs]
           [--sizes 256,1024,4096] [--runs 2]
"""

from __future__ import annotations

import argparse
import gc
import time


def _best_of(fn, runs: int) -> float:
    best = float("inf")
    for _ in range(runs):
        gc.collect()
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/repo/.scale/sf100_docs")
    ap.add_argument("--sizes", default="256,1024,4096")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from paas_auditor_spark.operators.corpus import (
        trigram_interp_perplexity_from_model,
    )
    from paas_auditor_spark.queries import (
        _bloom_gate_persisted,
        _lm_model_cached,
        _th,
    )
    from paas_auditor_spark.session import get_spark

    spark = get_spark(app_name="shard-batch-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    sizes = [int(s) for s in args.sizes.split(",")]
    model = _lm_model_cached(spark, args.sf_dir)

    def batch(n: int):
        return _th(spark, args.sf_dir, "documents").filter(
            (F.col("doc_id") >= 16) & (F.col("doc_id") < 16 + n)
        )

    shapes = {
        "bloom_sharded": lambda n: _bloom_gate_persisted(
            spark, args.sf_dir, batch(n), broadcast_hits=True
        ),
        "lm_sharded": lambda n: trigram_interp_perplexity_from_model(
            spark, model, batch(n), batch_probe=True
        ),
    }
    for name, build in shapes.items():
        print(f"\n### {name} — probe wall vs batch size ({args.sf_dir})")
        print("| batch docs | wall (warm) | vs first |")
        print("|---|---|---|")
        base = None
        for n in sizes:
            build(n).write.format("noop").mode("overwrite").save()  # warm
            wall = _best_of(
                lambda: build(n)
                .write.format("noop")
                .mode("overwrite")
                .save(),
                args.runs,
            )
            base = base or wall
            print(f"| {n} | {wall:.3f} s | {wall / base:.2f}x |")


if __name__ == "__main__":
    main()
