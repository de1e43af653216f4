"""Tests for the curation extras: deterministic split, Zipf diagnostics,
quality classifier, and JL random projection."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from paas_auditor_spark.operators import similarity

SF = "/root/testdata/sf0.001"


def _docs(spark):
    from paas_auditor_spark.sources.tables import load_table

    return load_table(spark, SF, "documents")


def test_train_test_split_deterministic_and_total(spark):
    from paas_auditor_spark.queries import q_train_test_split

    a = q_train_test_split(spark, SF).collect()
    b = q_train_test_split(spark, SF).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    total = sum(r["n_docs"] for r in a)
    assert total == _docs(spark).count()
    # hex-prefix thresholds give ~80/10/10; assert loose bands so a
    # testdata regen can't silently skew the split logic
    by_split: dict[str, int] = {}
    for r in a:
        by_split[r["split"]] = by_split.get(r["split"], 0) + r["n_docs"]
    assert 0.7 < by_split["train"] / total < 0.9
    assert 0.05 < by_split["val"] / total < 0.15
    assert 0.05 < by_split["test"] / total < 0.15


def test_train_test_split_stable_under_growth(spark):
    """Adding documents never reassigns existing ones (content-addressed)."""
    docs = _docs(spark)
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    split = (
        F.when(h < "cccd", "train").when(h < "e666", "val").otherwise("test")
    )
    full = {
        r["doc_id"]: r["s"]
        for r in docs.select("doc_id", split.alias("s")).collect()
    }
    half = {
        r["doc_id"]: r["s"]
        for r in docs.filter(F.col("doc_id") % 2 == 0)
        .select("doc_id", split.alias("s"))
        .collect()
    }
    assert all(full[k] == v for k, v in half.items())


def test_zipf_slope_negative_and_bounded(spark):
    from paas_auditor_spark.queries import q_zipf_slope

    rows = q_zipf_slope(spark, SF).collect()
    assert rows
    for r in rows:
        # frequency must decay with rank: slope strictly negative, and
        # steeper than a flat synthetic corpus would allow
        assert r["zipf_slope"] < -0.1, r
        assert r["n_terms"] > 10


def test_quality_classifier_is_sigmoid_of_features(spark):
    from paas_auditor_spark.queries import q_quality_classifier

    rows = q_quality_classifier(spark, SF).orderBy("doc_id").limit(50).collect()
    assert rows and all(0.0 <= r["score"] <= 1.0 for r in rows)
    assert all(r["keep"] == (r["score"] >= 0.5) for r in rows)


def test_projection_signs_deterministic_pm1():
    m = similarity.projection_signs(64, 8)
    assert len(m) == 8 and all(len(row) == 64 for row in m)
    assert all(v in (1.0, -1.0) for row in m for v in row)
    # rows must differ (distinct output dims), else the projection is rank-1
    assert len({tuple(r) for r in m}) == 8
    assert m == similarity.projection_signs(64, 8)


def test_random_projection_matches_numpy(spark):
    from paas_auditor_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings").limit(20)
    got = similarity.random_projection(emb, out_dim=8).orderBy("vec_id").collect()
    src = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
           for r in emb.collect()}
    signs = np.array(similarity.projection_signs(64, 8))
    for r in got:
        want = signs @ src[r["vec_id"]]
        have = np.array([r[f"rp_{j}"] for j in range(8)])
        assert np.allclose(have, np.round(want, 4), atol=1e-9)


def test_random_projection_bounded_distortion(spark):
    """JL sanity: E[||Sx||²] = out_dim·||x||² for ±1 rows, so the rescaled
    projected distance over the source distance is a sqrt(χ²_8/8)-shaped
    ratio — individually bounded, mean near 1.  (Rank correlation is NOT
    a valid check here: high-dim random pair distances concentrate, so
    their ranks under any 8-dim projection are noise.)"""
    from paas_auditor_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings").limit(40)
    proj = {
        r["vec_id"]: np.array([r[f"rp_{j}"] for j in range(8)])
        for r in similarity.random_projection(emb, out_dim=8).collect()
    }
    src = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
           for r in emb.collect()}
    ids = sorted(src)
    ratios = []
    for i in range(0, len(ids) - 1, 2):
        a, b = ids[i], ids[i + 1]
        d_src = float(np.linalg.norm(src[a] - src[b]))
        d_prj = float(np.linalg.norm(proj[a] - proj[b])) / math.sqrt(8)
        if d_src > 0:
            ratios.append(d_prj / d_src)
    assert ratios and all(0.2 < r < 3.0 for r in ratios), ratios
    assert 0.7 < float(np.mean(ratios)) < 1.3, np.mean(ratios)


def test_chi2_keywords_planted_distinctive_term(spark):
    """A term appearing in every doc of one source and nowhere else must
    be that source's top χ² keyword; a uniformly-present term must not
    appear at all (no-signal filter)."""
    import os
    import tempfile

    from paas_auditor_spark.queries import REGISTRY

    rows = []
    for i in range(20):
        src = "a" if i < 10 else "b"
        marker = "zebra" if src == "a" else "yak"
        rows.append((i, f"common filler {marker} words", "en", src, 20))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet")
        )
        out = REGISTRY["chi2_keywords"].fn(spark, d).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["term"])
    assert by_src["a"][0] in ("zebra", "yak")  # max chi2, tie by term asc
    assert "common" not in by_src["a"] and "filler" not in by_src["a"]


def test_source_drift_psi_zero_for_identical_distributions(spark):
    """Sources with identical length distributions → PSI ≈ 0 for each."""
    import os
    import tempfile

    from paas_auditor_spark.queries import REGISTRY

    rows = []
    i = 0
    for src in ("a", "b"):
        for ln in (10, 60, 110, 160) * 5:  # same shape in both sources
            rows.append((i, "x" * ln, "en", src, ln))
            i += 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet")
        )
        out = {r["source"]: r["psi"] for r in
               REGISTRY["source_drift_psi"].fn(spark, d).collect()}
    assert set(out) == {"a", "b"}
    assert all(abs(v) < 1e-6 for v in out.values()), out


def test_label_centroid_stats_bounds(spark, sf_dir):
    from paas_auditor_spark.queries import REGISTRY

    rows = REGISTRY["label_centroid_stats"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_vecs"] > 0
        assert -1.0001 <= r["min_cos"] <= r["avg_cos"] <= 1.0001
        assert r["centroid_norm"] > 0


def test_weighted_sample_aes_properties(spark):
    """A-ES sanity: k per group, deterministic across runs, and a
    dominant-weight item (1e6 vs 1) lands in the sample — its key
    ln(u)/w is ~0 while light items sit near ln(u), far below."""
    import os
    import tempfile

    from paas_auditor_spark.queries import REGISTRY

    rows = [(0, "big", "en", "s", 1_000_000)] + [
        (i, "small", "en", "s", 1) for i in range(1, 51)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet")
        )
        got1 = REGISTRY["weighted_sample"].fn(spark, d).collect()
        got2 = REGISTRY["weighted_sample"].fn(spark, d).collect()
    assert [tuple(r) for r in got1] == [tuple(r) for r in got2]
    assert len(got1) == 5
    assert 0 in {r["doc_id"] for r in got1}  # the heavy item is sampled
    # keys are sorted descending with rank
    keys = [r["es_key"] for r in got1]
    assert keys == sorted(keys, reverse=True)


def test_pagerank_matches_numpy_power_iteration(spark):
    """pagerank() equals an independent numpy power iteration of the same
    recurrence on a constructed graph (sink, source, and cycle nodes)."""
    from paas_auditor_spark.operators.graph import pagerank

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=8).collect()}

    nodes = sorted({n for e in edges for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    r = np.full(n, 1.0 / n)
    for _ in range(8):
        nxt = np.full(n, (1.0 - 0.85) / n)
        for s, ds in out.items():
            for d in ds:
                nxt[idx[d]] += 0.85 * r[idx[s]] / len(ds)
        r = nxt
    for node in nodes:
        assert abs(got[node] - r[idx[node]]) < 1e-12, (node, got[node])
    # structural sanity: the cycle hub 'a' outranks the pure source 'd'
    assert got["a"] > got["d"]


def test_triangle_counts_k4_and_path(spark):
    """K4: every node closes C(3,2)=3 triangles; a path graph closes
    none; direction/duplication of input edges is irrelevant."""
    from paas_auditor_spark.operators.graph import triangle_counts

    k4 = [(a, b) for a in "abcd" for b in "abcd" if a != b]  # both dirs
    df = spark.createDataFrame(k4, "src string, dst string")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}

    path = [("a", "b"), ("b", "c"), ("c", "d")]
    pdf = spark.createDataFrame(path, "src string, dst string")
    assert triangle_counts(pdf).count() == 0


def test_triangle_counts_matches_bruteforce_random_graph(spark):
    """Degree-ordered orientation equals the O(n^3) itertools census on a
    deterministic pseudo-random graph (hash-derived edges, skewed hub)."""
    import itertools

    from paas_auditor_spark.operators.graph import triangle_counts

    n = 40
    edges = [
        (i, j)
        for i, j in itertools.combinations(range(n), 2)
        if (i * 7919 + j * 104729) % 5 == 0 or i == 0  # node 0 is a hub
    ]
    adj = set(edges)
    expected = {}
    for a, b, c in itertools.combinations(range(n), 3):
        if (a, b) in adj and (a, c) in adj and (b, c) in adj:
            for v in (a, b, c):
                expected[v] = expected.get(v, 0) + 1
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == expected


def test_pagerank_empty_edges_returns_empty(spark):
    from paas_auditor_spark.operators.graph import pagerank

    empty = spark.createDataFrame([], "src string, dst string")
    assert pagerank(empty, iterations=3).count() == 0


def test_interval_join_left_keeps_unmatched_events(spark):
    """how='left' must emit NULL-extended rows for events no interval
    contains (regression: a post-join containment filter dropped them)."""
    import datetime as dt

    from paas_auditor_spark.operators.rangejoin import interval_join

    B = dt.datetime(2024, 3, 1, 12, 0, 0)
    events = spark.createDataFrame(
        [(1, B), (2, B + dt.timedelta(hours=5))], "event_id long, ts timestamp"
    )
    ivs = spark.createDataFrame(
        [("w1", B - dt.timedelta(minutes=5), B + dt.timedelta(minutes=5))],
        "name string, start timestamp, end timestamp",
    )
    got = {
        r["event_id"]: r["name"]
        for r in interval_join(
            events, ivs, "ts", "start", "end", how="left"
        ).collect()
    }
    assert got == {1: "w1", 2: None}

    import pytest

    with pytest.raises(ValueError, match="only 'inner' and 'left'"):
        interval_join(events, ivs, "ts", "start", "end", how="full")


def test_segment_dedup_keeps_empty_docs(spark):
    """One row per input doc even when the text yields no segments."""
    from paas_auditor_spark.operators.corpus import segment_dedup

    df = spark.createDataFrame(
        [(1, "one two three four five six seven eight"),
         (2, ""), (3, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in segment_dedup(df).collect()}
    assert set(got) == {1, 2, 3}
    assert got[2]["n_segments"] == 0 and got[2]["clean_text"] == ""
    assert got[3]["n_segments"] == 0


def test_scd2_sentinel_survives_session_tz_change(spark):
    """The current-row sentinel is a fixed UTC instant: folding under a
    different session timezone still classifies open rows as current
    (regression: a string-cast sentinel moved with the session tz and
    every open row became history)."""
    import datetime as dt

    from paas_auditor_spark.operators.scd import scd2_apply, sentinel_ts

    B = dt.datetime(2024, 3, 1, 12, 0, 0)
    dim = spark.createDataFrame(
        [(1, "x", B)], "k long, attr string, valid_from timestamp"
    ).withColumn("valid_to", sentinel_ts())
    upd = spark.createDataFrame(
        [(1, "y", B + dt.timedelta(days=1))],
        "k long, attr string, effective_ts timestamp",
    )
    original = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        out = scd2_apply(dim, upd, "k", ["attr"]).collect()
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)
    # the open row was recognized as current and closed; the update
    # reopened — 2 rows, not 3 (dim passthrough + duplicate open row)
    assert len(out) == 2
    attrs = sorted((r["attr"], r["valid_to"] is not None) for r in out)
    assert [a for a, _ in attrs] == ["x", "y"]


def test_cached_artifact_rename_failure_surfaces(monkeypatch, tmp_path):
    """The r6 advice hole: a genuine rename failure (EXDEV when TMPDIR
    crosses filesystems, permissions) must raise at build time, not
    silently return a nonexistent path that later dies as an unrelated
    parquet read error.  A LOST RACE (destination exists) still
    publishes quietly."""
    import os

    from paas_auditor_spark.queries import _cached_artifact

    def build(tmp):
        os.makedirs(tmp)

    real_rename = os.rename

    def exdev(src, dst):
        raise OSError(18, "Invalid cross-device link")

    monkeypatch.setattr(os, "rename", exdev)
    with pytest.raises(OSError, match="cross-device"):
        _cached_artifact("advice-exdev", "paas_test_exdev_", build)

    # racer case: destination appears before the rename fails — swallowed
    def racer(src, dst):
        real_rename(src, dst)  # publish as "the racer" ...
        raise OSError(18, "Invalid cross-device link")  # ... then lose

    monkeypatch.setattr(os, "rename", racer)
    path = _cached_artifact("advice-race", "paas_test_race_", build)
    assert os.path.isdir(path)


def test_ivf_recall_denominator_tracks_truth(spark, tmp_path):
    """The r6 advice hole: with a corpus of <11 vectors, each query has
    fewer than 10 true neighbors; recall@10 at nprobe = n_centroids
    (exact search) must still read 1.0 — a hardcoded 10×10 denominator
    would understate it as truth_pairs/100."""
    import pandas as pd

    from paas_auditor_spark.queries import q_ivf_recall_curve

    rng = np.random.default_rng(7)
    pd.DataFrame(
        {
            "vec_id": np.arange(9, dtype=np.int64),
            "embedding": [
                rng.standard_normal(8).astype(np.float32) for _ in range(9)
            ],
            "label": np.zeros(9, dtype=np.int32),
        }
    ).to_parquet(str(tmp_path / "embeddings.parquet"))
    rows = sorted(
        q_ivf_recall_curve(spark, str(tmp_path)).collect(),
        key=lambda r: r["nprobe"],
    )
    assert rows[-1]["nprobe"] == 8
    assert rows[-1]["recall_at_10"] == 1.0
