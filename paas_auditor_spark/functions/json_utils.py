"""JSON / envelope column helpers.

Covers the reference's scalar JSON surface (SURVEY.md §2.2):
- P9  time formatting to RFC3339 Z strings
  (reference cf_audit_event_fetcher.go:26)
- P10 RFC3339 parse to epoch seconds
  (reference cf_audit_events_to_splunk_shipper.go:158-169)
- P11/P13 Splunk HEC envelope serialization
  (reference cf_audit_events_to_splunk_shipper.go:24-28,187-192)
- P12 metadata JSON access (reference store.go:171-176)

The ship envelope is built with explicit string concatenation rather than
``to_json(struct(...))`` so the byte layout (field order, no spaces) is
deterministic and engine-independent — the reference's Go ``json.Marshal``
likewise emits struct-ordered compact JSON.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

RFC3339 = "yyyy-MM-dd'T'HH:mm:ss'Z'"


def rfc3339(ts: Column) -> Column:
    """Format a timestamp as the reference's API query format (P9)."""
    return F.date_format(ts, RFC3339)


def epoch_seconds(ts: Column) -> Column:
    """Whole epoch seconds from a timestamp (P10)."""
    return F.unix_timestamp(ts).cast("long")


def json_field(json_str: Column, field: str) -> Column:
    """Extract one field from a raw-JSON string column (P12)."""
    return F.get_json_object(json_str, f"$.{field}")


def splunk_envelope(
    guid: Column,
    created_at: Column,
    event_type: Column,
    source_env: str,
    sourcetype: str = "cf-audit-event",
) -> Column:
    """Wrap an event as the Splunk HEC payload (P13 + P11).

    Reference shape (cf_audit_events_to_splunk_shipper.go:24-28):
    ``{"sourcetype": ..., "source": <deploy_env>, "event": {...}}``.
    """
    return F.concat(
        F.lit('{"sourcetype":"' + sourcetype + '","source":"' + source_env + '"'),
        F.lit(',"event":{"guid":"'),
        guid.cast("string"),
        F.lit('","created_at":"'),
        rfc3339(created_at),
        F.lit('","event_type":"'),
        event_type,
        F.lit('"}}'),
    )


__all__ = ["RFC3339", "epoch_seconds", "json_field", "rfc3339", "splunk_envelope"]
