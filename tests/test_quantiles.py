"""Mergeable histogram quantile sketch: merge/persist lifecycle,
accuracy envelope, geometry validation (operators/quantiles.py)."""

import pytest

from pyspark.sql import functions as F

from paas_auditor_spark.operators.quantiles import (
    hist_merge,
    hist_quantiles,
    hist_sketch,
)

NB = 32


def _vals(spark, lo, n, col="v"):
    return spark.range(lo, lo + n).select(F.col("id").cast("double").alias(col))


def _rows(df):
    return sorted(
        (int(r["bin"]), int(r["cnt"]), float(r["lo"]), float(r["hi"]), int(r["nb"]))
        for r in df.collect()
    )


def test_merge_of_partials_equals_single_shot(spark):
    """Counts are additive, so folding per-shard partials must be
    bit-equal to sketching the concatenated data — the property that
    makes incremental rollup valid (fixed explicit bounds: in-plan
    bounds would differ per shard)."""
    a, b = _vals(spark, 0, 400), _vals(spark, 400, 600)
    both = a.unionByName(b)
    direct = hist_sketch(both, "v", n_bins=NB, lo=0.0, hi=999.0)
    merged = hist_merge(
        hist_sketch(a, "v", n_bins=NB, lo=0.0, hi=999.0),
        hist_sketch(b, "v", n_bins=NB, lo=0.0, hi=999.0),
    )
    assert _rows(merged) == _rows(direct)


def test_persist_roundtrip_then_merge(spark, tmp_path):
    """The bloom_words lifecycle: per-shard sketches land as parquet,
    read back, merged — identical to the in-memory fold."""
    p1, p2 = str(tmp_path / "day1"), str(tmp_path / "day2")
    hist_sketch(_vals(spark, 0, 300), "v", n_bins=NB, lo=0.0, hi=599.0).write.parquet(p1)
    hist_sketch(_vals(spark, 300, 300), "v", n_bins=NB, lo=0.0, hi=599.0).write.parquet(p2)
    merged = hist_merge(spark.read.parquet(p1), spark.read.parquet(p2))
    direct = hist_sketch(
        _vals(spark, 0, 600), "v", n_bins=NB, lo=0.0, hi=599.0
    )
    assert _rows(merged) == _rows(direct)


def test_by_groups_fold_into_merge(spark):
    """Per-group partials (the daily-rollup shape) fold through
    hist_merge into the same sketch as an ungrouped build."""
    df = _vals(spark, 0, 500).withColumn("day", (F.col("v") % 5).cast("int"))
    grouped = hist_sketch(df, "v", n_bins=NB, lo=0.0, hi=499.0, by=["day"])
    assert grouped.select("day").distinct().count() == 5
    merged = hist_merge(grouped)
    direct = hist_sketch(df, "v", n_bins=NB, lo=0.0, hi=499.0)
    assert _rows(merged) == _rows(direct)


def test_quantile_accuracy_within_bin_width(spark):
    """Interpolated estimates are within one bin width of the exact
    quantile (uniform 0..9999, in-plan bounds)."""
    df = _vals(spark, 0, 10_000)
    sk = hist_sketch(df, "v", n_bins=64)
    probs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    est = {r["prob"]: r["est"] for r in hist_quantiles(sk, probs).collect()}
    exact = {
        p: df.agg(F.expr(f"percentile(v, {p})").alias("q")).collect()[0]["q"]
        for p in probs
    }
    width = 9999.0 / 64
    for p in probs:
        assert abs(est[p] - exact[p]) <= width, (p, est[p], exact[p])


def test_geometry_mismatch_rejected(spark):
    a = hist_sketch(_vals(spark, 0, 100), "v", n_bins=NB, lo=0.0, hi=99.0)
    diff_bins = hist_sketch(_vals(spark, 0, 100), "v", n_bins=16, lo=0.0, hi=99.0)
    diff_range = hist_sketch(_vals(spark, 0, 100), "v", n_bins=NB, lo=0.0, hi=50.0)
    for bad in (diff_bins, diff_range):
        with pytest.raises(ValueError, match="geometr"):
            hist_merge(a, bad)
    with pytest.raises(ValueError, match="no geometry column"):
        hist_merge(a.drop("nb"))
    with pytest.raises(ValueError, match="no geometry column"):
        hist_quantiles(a.drop("lo"), [0.5])


def test_null_values_dropped(spark):
    df = spark.createDataFrame(
        [(float(i),) for i in range(50)] + [(None,)] * 7, "v double"
    )
    sk = hist_sketch(df, "v", n_bins=8, lo=0.0, hi=49.0)
    assert sk.agg(F.sum("cnt")).collect()[0][0] == 50
    assert sk.where(F.col("bin").isNull()).count() == 0


def test_degenerate_constant_range(spark):
    """hi == lo (all values identical): everything in bin 0, every
    quantile reads off the constant — no division by zero."""
    df = spark.createDataFrame([(7.5,)] * 20, "v double")
    sk = hist_sketch(df, "v", n_bins=NB)
    assert _rows(sk) == [(0, 20, 7.5, 7.5, NB)]
    out = hist_quantiles(sk, [0.5, 0.99]).collect()
    assert [r["est"] for r in out] == [7.5, 7.5]


def test_streaming_collector_maintains_quantiles(spark, tmp_path):
    """Incremental quantile maintenance e2e: per-micro-batch sketches
    land atomically under the collector path, and the running quantile
    is read off the folded history WITHOUT rescanning any batch —
    batch-2 data visibly shifts the estimate, and the merged sketch
    equals a single-shot build over everything that streamed."""
    import os

    from paas_auditor_spark.operators.quantiles import hist_collector, hist_read

    src = str(tmp_path / "src")
    sk_path = str(tmp_path / "sketches")
    os.makedirs(src)

    def drop(vals):
        spark.createDataFrame([(float(v),) for v in vals], "v double").coalesce(
            1
        ).write.mode("append").parquet(src)

    drop(range(0, 500))
    q = (
        spark.readStream.schema("v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(
            hist_collector("v", sk_path, n_bins=NB, lo=0.0, hi=999.0)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        p50_a = hist_quantiles(
            hist_merge(hist_read(spark, sk_path)), [0.5]
        ).collect()[0]["est"]

        drop(range(500, 1000))  # batch 2 shifts the distribution right
        q.processAllAvailable()
        p50_b = hist_quantiles(
            hist_merge(hist_read(spark, sk_path)), [0.5]
        ).collect()[0]["est"]
    finally:
        q.stop()

    assert abs(p50_a - 250.0) <= 999.0 / NB
    assert abs(p50_b - 500.0) <= 999.0 / NB
    # ≥2 committed batch directories, no leftover hidden tmp dirs
    committed = [d for d in os.listdir(sk_path) if d.startswith("batch-")]
    assert len(committed) >= 2
    assert not [d for d in os.listdir(sk_path) if d.startswith(".batch-")]
    # folded history ≡ single-shot build over everything that streamed
    direct = hist_sketch(
        _vals(spark, 0, 1000), "v", n_bins=NB, lo=0.0, hi=999.0
    )
    assert _rows(hist_merge(hist_read(spark, sk_path))) == _rows(direct)


def test_hist_retraction_equals_never_ingested(spark, tmp_path):
    """Additive deletion for the quantile sketch: ingest everything,
    retract a subset (hist_collector retract=True), merge — the sketch
    must be bit-equal to one built only over the survivors, and
    quantiles match.  A replayed retraction batch stays a no-op."""
    from paas_auditor_spark.operators.quantiles import (
        hist_collector,
        hist_read,
    )

    all_vals = _vals(spark, 0, 1000)
    doomed = all_vals.filter(F.col("v") % 10 < 3)
    surviving = all_vals.filter(~(F.col("v") % 10 < 3))

    path = str(tmp_path / "sk")
    ingest = hist_collector("v", path, NB, 0.0, 999.0)
    ingest(all_vals.filter(F.col("v") < 500), 0)
    ingest(all_vals.filter(F.col("v") >= 500), 1)
    retract = hist_collector("v", path, NB, 0.0, 999.0, retract=True)
    retract(doomed, 2)
    retract(doomed, 2)  # replay: must not double-subtract

    merged = hist_merge(hist_read(spark, path))
    want = hist_merge(hist_sketch(surviving, "v", n_bins=NB, lo=0.0, hi=999.0))
    assert _rows(merged) == _rows(want)
    got_q = hist_quantiles(merged, [0.5, 0.9]).collect()
    want_q = hist_quantiles(want, [0.5, 0.9]).collect()
    assert [tuple(r) for r in got_q] == [tuple(r) for r in want_q]


def test_hist_retraction_of_never_ingested_raises(spark):
    """Retracting values that were never ingested nets a bin negative;
    the merge refuses loudly instead of serving corrupted quantiles."""
    ingested = hist_sketch(_vals(spark, 0, 100), "v", n_bins=NB, lo=0.0, hi=999.0)
    foreign = hist_sketch(
        _vals(spark, 900, 50), "v", n_bins=NB, lo=0.0, hi=999.0
    ).withColumn("cnt", -F.col("cnt"))
    with pytest.raises(ValueError, match="negative net counts"):
        hist_merge(ingested, foreign)


def test_out_of_range_values_clamp_to_boundary_bins(spark):
    """Values outside the declared [lo, hi] land in the boundary bins
    (the fixed-range histogram contract) instead of erroring."""
    df = spark.createDataFrame(
        [(-100.0,), (5.0,), (500.0,)], "v double"
    )
    sk = hist_sketch(df, "v", n_bins=8, lo=0.0, hi=8.0)
    got = {int(r["bin"]): int(r["cnt"]) for r in sk.collect()}
    assert got == {0: 1, 5: 1, 7: 1}


def test_partial_explicit_bounds_rejected(spark):
    """One explicit bound + one derived would silently re-anchor the
    bins; the builder must refuse instead."""
    df = _vals(spark, 0, 10)
    with pytest.raises(ValueError, match="both explicit or both derived"):
        hist_sketch(df, "v", n_bins=8, lo=0.0)
    with pytest.raises(ValueError, match="both explicit or both derived"):
        hist_sketch(df, "v", n_bins=8, hi=9.0)


def test_empty_sketch_geometry_message(spark):
    """An empty sketch (zero-key micro-batches) reads as the actionable
    empty-relation error, not a misleading 'mixed sketch geometries []'
    (r6 advice)."""
    from paas_auditor_spark.operators.quantiles import _geometry, hist_sketch

    xs = spark.range(10).select(F.col("id").cast("double").alias("x"))
    empty = hist_sketch(xs, "x", lo=0.0, hi=10.0, n_bins=4).where(F.lit(False))
    with pytest.raises(ValueError, match="empty sketch relation"):
        _geometry(empty)
