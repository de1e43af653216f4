"""Probe-only scale datapoints for the persisted MinHash gate (r9
verdict task #5, measured after the r10 fold materialization): the
registered ``minhash_gate_persisted`` probe at sf0.1 / 10× / 100×
slices, against the SAME index (a) folded — the deployment shape, no
index-wide aggregation in the probe plan — and (b) with the collapse
part stripped — the r9 legacy shape that re-aggregates the whole index
per gate call.  Prints one JSON line per (slice, shape) plus a final
markdown table for SURVEY §6, including the plan-shape fingerprint
diff across scales for the folded probe.

Usage: PYTHONPATH=. python tools/gate_probe_rehearsal.py
           [--slices sf0.1,sf1,sf10] [--runs 2]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import shutil
import time

from tools.scale_rehearsal import plan_shape

SLICE_DIRS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": "/root/repo/.scale/sf1",
    "sf10": "/root/repo/.scale/sf10",
    # documents-only factor-1000 slice (tools/make_scale_slice.py
    # --factor 1000 --tables documents) — the gate only reads documents
    "sf100": "/root/repo/.scale/sf100_docs",
}


def probe_df(spark, index_path: str, sf_dir: str):
    """The registered query's probe, pointed at an explicit index."""
    from pyspark.sql import functions as F

    from paas_auditor_spark.operators.dedup import (
        minhash_incremental_persisted,
    )
    from paas_auditor_spark.queries import _t

    base = (
        _t(spark, sf_dir, "documents")
        .filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 130))
        .select("doc_id", "text")
    )
    new = base.select(
        (F.col("doc_id") + F.lit(10_000_000_000_000)).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" v"), F.col("doc_id").cast("string")
        ).alias("text"),
    )
    return minhash_incremental_persisted(
        spark, index_path, new, threshold=0.5, num_hashes=24, num_bands=12
    )


def time_probe(spark, index_path: str, sf_dir: str, runs: int):
    best = float("inf")
    rows = None
    for _ in range(runs):
        t0 = time.perf_counter()
        df = probe_df(spark, index_path, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
        if rows is None:
            rows = df.count()
        df = None
        gc.collect()
    return round(best, 3), rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--slices", default="sf0.1,sf1,sf10")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from paas_auditor_spark.session import get_spark
    from paas_auditor_spark.queries import _minhash_index_cached

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    shapes = {}
    for name in args.slices.split(","):
        sf_dir = SLICE_DIRS[name]
        t0 = time.perf_counter()
        idx = _minhash_index_cached(spark, sf_dir)  # builds + folds once
        build_s = round(time.perf_counter() - t0, 3)

        folded_s, n_rows = time_probe(spark, idx, sf_dir, args.runs)
        shapes[name] = plan_shape(probe_df(spark, idx, sf_dir))

        # legacy shape: same data, collapse part stripped → the probe
        # falls back to the per-call global collapse rebuild
        legacy = f"/tmp/gate_legacy_{name}"
        shutil.rmtree(legacy, ignore_errors=True)
        shutil.copytree(idx, legacy)
        for root, dirs, _files in os.walk(legacy):
            if "collapse" in dirs:
                shutil.rmtree(os.path.join(root, "collapse"))
                dirs.remove("collapse")
        legacy_s, n_rows2 = time_probe(spark, legacy, sf_dir, args.runs)
        assert n_rows == n_rows2, (name, n_rows, n_rows2)
        shutil.rmtree(legacy, ignore_errors=True)

        rec = {
            "slice": name,
            "build_or_cache_s": build_s,
            "probe_folded_s": folded_s,
            "probe_legacy_s": legacy_s,
            "gate_pairs": n_rows,
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    base = results[0]
    print("\n| slice | probe (folded) | probe (legacy r9) | folded wall vs sf0.1 | plan Δ vs sf0.1 |")
    print("|---|---|---|---|---|")
    for r in results:
        nm = r["slice"]
        diff = {
            k: (shapes[nm].get(k, 0), shapes[base["slice"]].get(k, 0))
            for k in set(shapes[nm]) | set(shapes[base["slice"]])
            if shapes[nm].get(k, 0) != shapes[base["slice"]].get(k, 0)
        }
        print(
            f"| {nm} | {r['probe_folded_s']} s | {r['probe_legacy_s']} s "
            f"| {round(r['probe_folded_s'] / base['probe_folded_s'], 2)}x "
            f"| {diff if diff else 'invariant'} |"
        )


if __name__ == "__main__":
    main()
