"""Engine benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints TWO JSON lines to stdout:
  1. the full record (metric/value/unit/queries/sf) — the complete
     per-query map, ALSO written verbatim to BENCH_DETAIL.json next to
     this script on EVERY run (VERDICT r11 #2: the driver's PERF reads
     the sidecar the summary points at; official-only writes left two
     rounds of ad-hoc driver runs with no per-query data at all).  The
     record carries ``"official": true/false`` so a committed official
     close is distinguishable from an ad-hoc control run that
     overwrote the working-tree copy (the VERDICT r7 #4 concern —
     resolved by self-identification instead of by not writing);
  2. LAST, a compact summary (metric/value/unit/n_queries/slowest/sf)
     small enough (<1 KB) that a bounded tail-capture of stdout always
     retains one intact, parseable line carrying total_wall.
The capture window that records official runs keeps the final ~2000
bytes of stdout; round 6's single 3.5 KB line was cut mid-record
(parsed: null, first 46 queries lost), and the full 143-query map is
~3.4 KB even at 2-decimal compact encoding — it can never fit the
tail window, hence sidecar + compact-summary layout.

Each query is fully materialized through the noop sink (so limits/projections
can't short-circuit the measurement) after a small JVM warm-up.
"""

from __future__ import annotations

import gc
import json
import os
import re
import sys
import time

HEADLINE = [
    "unshipped_events",
    "raw_events_page",
    "splunk_envelope",
    "idempotent_reingest",
    "pricing_summary",
    "top_revenue_orders",
    "regional_revenue",
    "brand_nation_revenue",
    "order_priority_counts",
    "promo_revenue",
    "small_quantity_revenue",
    "idle_customers",
    "returned_item_customers",
    "hourly_rollup",
    "rolling_daily_value",
    "daily_gapfill",
    "value_stats",
    "value_percentiles_exact",
    "sessionization",
    "interval_join",
    "dedup_exact",
    "dedup_clusters",
    # dedup_pipeline_full stays OUT of the headline like pagerank /
    # bpe_merges / kmeans: its star-CC stage is inherently stage-serial
    # (fixpoint rounds are scheduling barriers at sf0.1, not data
    # volume); correctness is driver-checked via the registry and its
    # accounting invariants are pytest-pinned
    "text_quality",
    "token_stats",
    "token_histogram",
    "min_cost_supplier",
    "customer_order_distribution",
    "lone_returned_supplier",
    "repetition_ratio",
    "tfidf_top_terms",
    "quality_filter",
    "funnel_analysis",
    "cohort_retention",
    "scd2_history",
    "pii_scrub",
    "doc_chunks",
    "inverted_index",
    "minhash_near_dup",
    "minhash_near_dup_md5",
    "minhash_gate_md5",
    # minhash_gate_folded_md5 supersedes minhash_gate_tombstoned_md5 in
    # the headline (r10 verdict task #1): a probe-per-ingest-tick
    # deployment measures the post-fold zero-reconciliation plan — the
    # adversarial read-time reconciliation stays oracle-registered as
    # minhash_gate_tombstoned_md5 (same oracle) and equality-pinned in
    # tests/test_dedup.py, just not charged to the headline
    "minhash_gate_folded_md5",
    "minhash_bucket_audit_md5",
    # dedup_clusters_minhash_md5 / dedup_pipeline_md5 stay OUT like
    # dedup_pipeline_full: their star-CC closure is stage-serial
    # (fixpoint rounds); the edge stage's cost is already measured via
    # minhash_near_dup_md5
    "minhash_gate_persisted",
    "simhash_md5",
    "simhash",
    "knn_bruteforce",
    "embedding_near_dup_lsh",
    "multimodal_features",
    "bm25_search",
    "bm25_persisted",
    "bm25_tombstoned",
    "hybrid_search_rrf",
    "embedding_quantize",
    "mad_outliers",
    "heavy_hitters",
    "zorder_key",
    "audio_windows",
    "image_tiles",
    "avro_bronze_roundtrip",
    "minhash_bucket_audit",
    "curation_pipeline",
    "semantic_dedup",
    "segment_dedup",
    "lm_perplexity",
    "lm_perplexity_interp",
    "lm_perplexity_persisted",
    # the per-ingest-batch deployment twin (broadcast-semi probe of the
    # persisted model — zero model shuffles); r12 candidate #5
    "lm_perplexity_sharded",
    "lm_perplexity_retracted",
    "temperature_sample",
    "knn_ivfpq",
    "knn_ivfpq_persisted",
    "knn_ivf_persisted",
    "knn_ivf_tombstoned",
    "dedup_keep_best",
    "train_test_split",
    "fim_transform",
    "zipf_slope",
    "quality_classifier",
    "random_projection",
    "asof_join",
    "asof_join_tolerance",
    "weighted_sample",
    # pagerank and bpe_merges stay OUT of the headline like kmeans:
    # power-iteration / merge rounds are inherently stage-serial (their
    # sf0.1 wall time is scheduling barriers, not data volume);
    # correctness is driver-checked via the registry either way
    "chi2_keywords",
    "source_drift_psi",
    "label_centroid_stats",
    "triangle_count",
    "duplicate_spans",
    "span_removal",
    "dsir_sample",
    "source_overlap",
    "source_novelty",
    "packing_efficiency",
    "cms_estimate",
    "quantile_sketch",
    "quantile_sketch_retracted",
    "phrase_search",
    "ql_search",
    "type_cooccurrence_lift",
    "skipgram_pairs",
    "negative_samples",
    "join_size_estimate",
    "join_size_sketch",
    "ewma_daily",
    "ewma_anomaly",
    "cusum_drift",
    "bootstrap_se",
    "rolling_distinct_users",
    "hll_overlap",
    "hll_overlap_md5",
    "embedding_covariance",
    "pca_projection",
    "embedding_isotropy",
    "k_anonymity_audit",
    "dp_noisy_counts",
    "event_transition_matrix",
    "centroid_classifier_eval",
    "weekday_seasonality",
    "type_correlation",
    "session_paths",
    "user_activity_features",
    "kaplan_meier_retention",
    "ab_test_ztest",
    "time_to_convert",
    "silhouette_score",
    "activity_gini",
    "traffic_pareto",
    # ivf_recall_curve, cdc_dedup_clusters and minhash_quality_audit
    # stay OUT of the headline: the recall sweep is a 4-point driver
    # loop, the CDC closure runs star-CC fixpoint rounds, and the
    # banding audit's ground truth is a deliberate bounded all-pairs
    # scan (an audit, not a production path); all are driver-checked
    # via the registry with their contracts pytest-pinned
    "cdc_chunk_stats",
    "cdc_near_dup",
    "quality_prune",
    "chunk_quality_prune",
    "tokenizer_fertility",
    "mixture_weights_fit",
    "bloom_decontaminate",
    "bloom_decontaminate_persisted",
    # the per-ingest-batch deployment twin (range-pruned batch scan
    # against the persisted filter literal); r12 candidate #5
    "bloom_decontaminate_sharded",
    "bloom_pruned_join",
    "token_entropy",
    "hard_negatives",
    "skew_audit",
    "chat_assembly",
    "chat_assembly_sessions",
    "corpus_report",
    "epoch_shuffle",
    # mmr_diversity and bpe_merges/bpe_vocab stay OUT like kmeans and
    # pagerank: greedy/merge rounds are stage-serial 1-row argmaxes —
    # wall time there is scheduling barriers, not data volume
]


# Paired drift controls (r10 verdict task #6): three stable, plan-simple
# queries re-timed at the START (right after JVM warm-up, before the
# headline sweep) and at the END of the run, emitted alongside their
# in-sequence headline timings plus loadavg — so a cross-round record
# carries its own contention calibration (r10 needed a separate
# tools/drift_control.py session to explain a 164 s vs 148 s face-value
# gap whose per-query median was 0.998).  Two ratios (VERDICT r11 #7 —
# the old single ratio conflated JVM warm-up with CPU steal because the
# three controls are the FIRST headline entries):
#   ``inflation``       = controls_headline / controls_end — how much
#     slower the controls ran in-sequence than at the quiet tail;
#   ``inflation_start`` = controls_start / controls_end — box drift
#     between the two bracketing re-times, warm-up-free on both sides.
# ≈ 1 on both means an uncontended sweep; a prior round's control block
# normalizes cross-round totals.  NOTE the start re-time warms the three
# control queries before their in-sequence headline pass; best-of-2
# already takes the warm minimum, so the headline number's meaning is
# unchanged (measured: within noise of the r11 protocol).
CONTROLS = ["unshipped_events", "pricing_summary", "dedup_exact"]


def _best_of_two(fn, spark, sf_dir: str) -> float:
    """The one timing protocol both the headline sweep and the
    end-of-run control re-time use — the inflation ratio is only
    meaningful because both sides measure IDENTICALLY.  Best-of-2 (the
    first pass pays JIT/codegen warm-up and any host CPU-steal noise;
    the min is the steady-state number a warm cluster would see), full
    materialization through the noop sink, then ref-drop + one gc pass:
    localCheckpoint blocks (minhash, LSH, CC, kmeans) are freed by the
    ContextCleaner only after the Python DataFrame is GC'd — across 50+
    queries the dead blocks otherwise pile up in executor storage and
    later queries pay the GC pressure (measured: simhash 0.4 s isolated
    vs 1.7 s late in a long run)."""
    runs = []
    for _ in range(2):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    df = None
    gc.collect()
    return round(min(runs), 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from paas_auditor_spark.queries import REGISTRY
    from paas_auditor_spark.session import get_spark

    spark = get_spark(app_name="paas-auditor-spark-bench")
    # warm up the JVM / codegen path so query 1 isn't charged for startup
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # start-of-run control re-time (VERDICT r11 #7): same protocol, same
    # session, AFTER warm-up but BEFORE the sweep — pairs with the end
    # block so drift is measured warm-up-free at both ends
    controls_start = {
        name: _best_of_two(REGISTRY[name].fn, spark, sf_dir)
        for name in CONTROLS
    }

    timings: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = _best_of_two(REGISTRY[name].fn, spark, sf_dir)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    # end-of-run control re-time: same protocol (_best_of_two), same
    # session, measured AFTER the full headline sweep — the spread vs
    # each control's in-sequence number is pure box/scheduler contention
    controls_end = {
        name: _best_of_two(REGISTRY[name].fn, spark, sf_dir)
        for name in CONTROLS
    }
    try:
        loadavg = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        loadavg = []
    ctl_headline = round(sum(timings[c] for c in CONTROLS), 3)
    ctl_start = round(sum(controls_start.values()), 3)
    ctl_end = round(sum(controls_end.values()), 3)
    control_block = {
        "queries": controls_end,
        "queries_start": controls_start,
        "headline_total": ctl_headline,
        "start_total": ctl_start,
        "end_total": ctl_end,
        "inflation": round(ctl_headline / ctl_end, 3) if ctl_end else None,
        "inflation_start": (
            round(ctl_start / ctl_end, 3) if ctl_end else None
        ),
        "loadavg": loadavg,
    }

    total = round(sum(timings.values()), 3)
    official = "--official" in sys.argv or bool(
        os.environ.get("SPARK_GRAFT_BENCH_DETAIL")
    )
    full = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "controls": control_block,
        "official": official,
        "sf": sf,
    }
    full_line = json.dumps(full)
    print(full_line)
    # sidecar: the complete per-query map, immune to tail truncation —
    # written on EVERY run (VERDICT r11 #2: the driver benches ad hoc, and
    # official-only writes meant PERF never saw per-query data; the
    # ``official`` flag inside the record preserves the r7 #4 distinction
    # between a committed official close and an ad-hoc overwrite).
    detail_path = os.environ.get("SPARK_GRAFT_BENCH_DETAIL") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    try:
        with open(detail_path, "w") as fh:
            fh.write(full_line + "\n")
    except OSError as ex:  # read-only checkout: summary lines carry totals
        print(f"# BENCH_DETAIL not written: {ex}", file=sys.stderr)
    # LAST line: compact summary that a 2000-byte stdout tail always
    # retains intact — this is the line the official record parses.
    slowest = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:6]
    )  # 6 (was 8): the control block joined the summary; stay <1 KB
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "n_queries": len(timings),
                "slowest": slowest,
                "controls": control_block,
                "detail": "BENCH_DETAIL.json",
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
