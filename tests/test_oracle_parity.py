"""Mirror of the driver's correctness gate: every registered query runs on
Spark AND as DuckDB SQL over the same parquet tables; results must match
(row count, column names, values).  Rows-only queries must at least run
and produce a stable schema.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from paas_auditor_spark.queries import REGISTRY
from paas_auditor_spark.schemas import TABLES


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf[sorted(pdf.columns)].copy()
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = out[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(out[c]):
            out[c] = out[c].astype("float64")
        elif pd.api.types.is_integer_dtype(out[c]):
            out[c] = out[c].astype("int64")
    return out.sort_values(by=list(out.columns), ignore_index=True)


ORACLE_QUERIES = [n for n, s in REGISTRY.items() if s.oracle]
ROWS_ONLY_QUERIES = [n for n, s in REGISTRY.items() if not s.oracle]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_dir, name):
    spec = REGISTRY[name]
    got = _normalize(spec.fn(spark, sf_dir).toPandas())
    con = _duck(sf_dir)
    want = _normalize(con.execute(spec.oracle).df())
    con.close()
    assert list(got.columns) == list(want.columns), name
    assert len(got) == len(want), name
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=0, rtol=0)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert df.columns  # stable schema
    assert df.count() >= 0


def test_certification_window_invariants():
    """The driver's official CORRECTNESS record hashes the FIRST 50
    registry entries, so their order is load-bearing: every window entry
    must be oracle-backed (hash-comparable, never rows-only), the
    reference-parity core must lead, and the r5-verdict flagships must
    all sit inside the window.  A registry edit that silently reorders
    or swaps in a rows-only entry fails here, not in the next round's
    official record."""
    from paas_auditor_spark.queries import _CERTIFICATION_WINDOW

    first50 = list(REGISTRY)[:50]
    assert first50 == _CERTIFICATION_WINDOW
    rows_only = [n for n in first50 if not REGISTRY[n].oracle]
    assert rows_only == []
    assert first50[:13] == [
        "unshipped_events", "latest_event_time", "count_and_max",
        "raw_events_page", "null_boundary", "time_format",
        "epoch_seconds", "props_json", "props_variant",
        "splunk_envelope", "validity_filter", "idempotent_reingest",
        "ordered_export",
    ]
    flagships = {
        "bloom_decontaminate_persisted",
        "span_removal",
        "curation_pipeline",
        "embedding_near_dup_lsh",
        "join_size_sketch",
        # r7 rotation (r6 verdict task #5): the r6 late wave
        "auto_skew_join", "cdc_near_dup",
        "bloom_pruned_join", "time_to_convert",
        # r8 rotation (r7 verdict task #2): the r7 wave — persisted
        # BM25 supersedes bm25_search's slot, the exact dedup pipeline
        # supersedes dedup_keep_best's, exact percentiles supersede
        # quantile_sketch's, and the two r7 corpus diagnostics land
        "bm25_persisted", "dedup_pipeline_exact",
        "value_percentiles_exact", "source_novelty", "type_correlation",
        # r9 rotation (r8 verdict task #4): the r8 oracle-exact wave —
        # knn_ivfpq takes knn_ivf_persisted's ANN slot, pq_codes takes
        # embedding_quantize's, audio_windows takes triangle_count's,
        # lm_perplexity_persisted takes lm_perplexity's,
        # stratified_sample takes temperature_sample's (all rotated-out
        # entries stay oracle-checked in the full registry)
        "knn_ivfpq", "pq_codes", "audio_windows",
        "lm_perplexity_persisted", "stratified_sample",
        # r10 rotation (r9 verdict task #2): the r9 oracle-exact wave —
        # avro_bronze_roundtrip takes bloom_decontaminate's slot,
        # image_tiles takes hybrid_search_rrf's, and the dedup md5
        # twins + ANN deletion take duplicate_spans' / dsir_sample's /
        # semantic_dedup's / chat_assembly_sessions' (all rotated-out
        # entries stay oracle-checked in the full registry)
        "avro_bronze_roundtrip", "image_tiles",
        "minhash_near_dup_md5", "simhash_md5",
        "minhash_gate_tombstoned_md5", "knn_ivf_tombstoned",
        # r11 rotation (r10 verdict task #2): hll_overlap_md5 — the
        # sketch family's overlap composition, rebuilt this round as a
        # true bottom-k/KMV twin with O(k) per-segment state — takes
        # heavy_hitters' slot (long-certified since r7; stays
        # oracle-checked in the full registry)
        "hll_overlap_md5",
    }
    assert flagships <= set(first50)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_oracle_predicate_splice_rules():
    """The parameterized oracle templates splice predicates into
    single-relation scopes only (review finding r11): the LM template's
    score_pred must AND onto an existing training WHERE but open its own
    WHERE when training is unrestricted, and the bloom template's
    probe_pred must land in both the cg CTE and the final derived table
    with bare (unqualified) column references."""
    from paas_auditor_spark.queries import _bloom_oracle, _lm_interp_oracle

    # LM: all four (where, score_pred) combinations
    plain = _lm_interp_oracle()
    assert "AND" not in plain.split("FROM (SELECT doc_id FROM documents")[1].split(")")[0]
    trained = _lm_interp_oracle(" WHERE doc_id % 4 <> 1")
    assert "FROM (SELECT doc_id FROM documents WHERE doc_id % 4 <> 1)" in trained
    scored = _lm_interp_oracle(score_pred="doc_id < 10")
    assert "FROM (SELECT doc_id FROM documents WHERE doc_id < 10)" in scored
    assert "FROM documents)" in scored  # toks (training) unrestricted
    both = _lm_interp_oracle(" WHERE doc_id % 4 <> 1", "doc_id < 10")
    assert (
        "FROM (SELECT doc_id FROM documents WHERE doc_id % 4 <> 1"
        " AND doc_id < 10)" in both
    )
    # the training stream never sees score_pred
    head = both.split("occ AS")[0]
    assert "doc_id < 10" not in head

    # bloom: the probe predicate lands in cg and the final derived
    # table, never qualified, and never in the bench (filter-build) CTE
    b = _bloom_oracle("doc_id >= 16 AND doc_id < 272")
    assert "WHERE doc_id % 97 <> 0 AND doc_id >= 16 AND doc_id < 272)" in b
    assert b.count("doc_id >= 16") == 2
    assert "d.doc_id >= 16" not in b
    bench_cte = b.split("bench AS")[1].split("pos AS")[0]
    assert "doc_id >= 16" not in bench_cte
