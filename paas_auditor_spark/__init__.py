"""paas_auditor_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of alphagov/paas-auditor.

The reference (studied at /root/reference, alphagov/paas-auditor @ 0.79.0) is
an incremental ETL pipeline: paginated HTTP event scan -> idempotent dedup
store -> cursor-driven at-least-once sink -> dataset statistics.  This package
re-expresses that shape Spark-first:

- ``sources``    paginated/rate-limited ingest scan (reference
                 pkg/fetchers/cf_audit_event_fetcher.go:16-84)
- ``operators``  cursor/unshipped-query, idempotent append, dedup family,
                 similarity search, stats (reference pkg/db/store.go:28-400)
- ``functions``  column-level helpers: JSON envelope, text analysis,
                 multimodal binary columns
- ``streaming``  micro-batch pipeline, ordered stop-on-failure shipper,
                 metrics (reference pkg/{collectors,shippers,informer})

Everything is DataFrame/SQL-first so Catalyst handles pushdown, pruning and
join planning; Python touches rows only in Arrow-batched Pandas UDFs.
"""

__version__ = "0.1.0"
