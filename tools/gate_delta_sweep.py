"""Probe cost vs UNFOLDED-DELTA size for the persisted MinHash gate —
the O(delta) reconciliation claim measured: against one folded 100×
index (490k docs), append delta batches of 0% / 1% / 10% of the corpus
and time the probe (best-of-2).  If the reconciliation is O(delta),
probe wall tracks the delta fraction, not the index.

Usage: PYTHONPATH=. python tools/gate_delta_sweep.py [--runs 2]
"""

from __future__ import annotations

import argparse
import gc
import json
import shutil
import time

SF_DIR = "/root/repo/.scale/sf10"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from paas_auditor_spark.operators.dedup import (
        minhash_incremental_persisted,
        minhash_index_collector,
    )
    from paas_auditor_spark.queries import _minhash_index_cached, _t
    from paas_auditor_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    idx = _minhash_index_cached(spark, SF_DIR)  # folded 100x index

    docs = _t(spark, SF_DIR, "documents")
    n_corpus = docs.filter(F.col("doc_id") >= 100).count()
    base = docs.filter(
        (F.col("doc_id") >= 100) & (F.col("doc_id") < 130)
    ).select("doc_id", "text")
    new = base.select(
        (F.col("doc_id") + F.lit(10_000_000_000_000)).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" v"), F.col("doc_id").cast("string")
        ).alias("text"),
    )

    for frac in (0.0, 0.01, 0.10):
        path = f"/tmp/gate_delta_{int(frac * 100)}"
        shutil.rmtree(path, ignore_errors=True)
        shutil.copytree(idx, path)
        n_delta = int(n_corpus * frac)
        if n_delta:
            delta = (
                docs.filter(F.col("doc_id") >= 100)
                .orderBy("doc_id")
                .limit(n_delta)
                .select(
                    (F.col("doc_id") + F.lit(1_000_000_000_000)).alias(
                        "doc_id"
                    ),
                    F.concat(F.col("text"), F.lit(" delta")).alias("text"),
                )
            )
            minhash_index_collector(path, num_hashes=24, num_bands=12)(
                delta, 99
            )
        best = float("inf")
        rows = None
        for _ in range(args.runs):
            t0 = time.perf_counter()
            df = minhash_incremental_persisted(
                spark, path, new,
                threshold=0.5, num_hashes=24, num_bands=12,
            )
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            if rows is None:
                rows = df.count()
            gc.collect()
        print(
            json.dumps(
                {
                    "delta_fraction": frac,
                    "delta_docs": n_delta,
                    "probe_s": round(best, 3),
                    "gate_pairs": rows,
                }
            ),
            flush=True,
        )
        shutil.rmtree(path, ignore_errors=True)


if __name__ == "__main__":
    main()
