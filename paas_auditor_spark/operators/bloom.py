"""Bloom-filter membership sketch, relational build + literal probe.

The scale path for benchmark decontamination (and any other "is this key
in the reference set" gate): the reference set's n-grams are folded into
an ``m``-bit Bloom filter (Bloom 1970) ON THE EXECUTORS — k md5-derived
bit positions per key, packed into 64-bit words — and the resulting
single-row filter (m/8 bytes: 128 KiB at m=2^20) ships to the corpus
scan as ONE binary literal, probed with pure column expressions.
Versus the exact broadcast-set join (`q_decontaminate`): the shipped
payload is O(m) bits regardless of how many keys went in, so the
reference set can grow to hundreds of millions of entries (a full
eval-suite shingle set) while the corpus side stays a single scan with
zero shuffle.  The price is a deterministic, boundable false-positive
rate ≈ (1 − e^(−kn/m))^k — flagged docs are re-checked exactly or
over-excluded, never silently missed (a Bloom filter has NO false
negatives).

Representation notes (hard-won, see test_bloom.py):

- The filter crosses to the probe side as a SINGLE BinaryType Literal,
  byte i holding bits 8i..8i+7, so the probe for bit p is
  ``getbit(conv(hex(substring(blob, p/8+1, 1)), 16, 10), p%8)`` — all
  leaf-cheap expressions inside whole-stage codegen (~0.4 s for 4 probes
  × 2M rows warm).  The three obvious alternatives are all slow in
  PySpark: ``F.lit(list_of_16384_longs)`` builds a CreateArray with one
  py4j call PER ELEMENT (~10 s to construct, and Catalyst re-walks the
  16384-child tree on every optimizer rule); a hex STRING literal makes
  every probe O(m) because UTF8String substring re-scans for char
  boundaries; and attaching the filter by broadcast join plants the
  probe in a BroadcastNestedLoopJoin CONDITION, which Spark evaluates
  interpreted per row (~8× slower at sf0.1).  Binary substring is an
  O(1) one-byte arraycopy.
- The one driver action in ``bloom_literal`` fetches exactly one row of
  m/8 bytes — bounded by the filter geometry, never by the key count;
  that bound is the entire point of a Bloom filter and the same
  contract as kmeans' literal-broadcast centroid assign
  (operators/similarity.py).

Everything is md5-derived and engine-portable, so build and probe are
exactly reproducible in ANY engine: the DuckDB oracle replays the
identical bit positions as set membership — the word/byte packing is
representation, not semantics.

No reference analog (alphagov/paas-auditor ships events, it does not
decontaminate corpora); this is part of the LLM-training-data surface
(SURVEY.md "beyond the reference" mandate), sibling to
operators/heavyhitters.py's CMS (point frequency) and Misra-Gries
(frequent items) — Bloom answers set membership.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "BLOOM_SCHEME",
    "bloom_assemble",
    "bloom_blob_from_words",
    "bloom_blob_literal",
    "bloom_bit_pos",
    "bloom_bitmap",
    "bloom_contains",
    "bloom_literal",
    "bloom_merge",
    "bloom_words",
    "bloom_words_collector",
    "bloom_words_read",
]


def bloom_bit_pos(key: Column, j: int, m: int) -> Column:
    """Bit position of hash ``j`` for ``key``: Kirsch–Mitzenmacher
    double hashing — ONE md5 per key, position_j = (h1 + j·h2) mod m
    with h1/h2 the digest's first/second 48-bit halves ("Less Hashing,
    Same Performance", Kirsch & Mitzenmacher 2006: g_j = h1 + j·h2
    preserves the Bloom FP asymptotics of k independent hashes).
    Measured ~2× the per-j-salted-md5 scheme on the gram stream (the
    md5 IS the probe's hot loop — k salted digests hash k× the bytes).
    48-bit halves keep every intermediate exact: h1 + 3·h2 < 2^50, an
    exact BIGINT on every engine (the dsir/weighted_sample conv trick),
    and both halves are non-negative so ``%`` agrees across engines."""
    digest = F.md5(key)
    h1 = F.conv(F.substring(digest, 1, 12), 16, 10).cast("long")
    h2 = F.conv(F.substring(digest, 13, 12), 16, 10).cast("long")
    return (h1 + F.lit(j) * h2) % m


# Version tag of the bit-position scheme, carried by every persisted
# words relation: "km1" = Kirsch-Mitzenmacher double hashing
# (bloom_bit_pos).  Geometry (m, k) alone cannot distinguish a table
# built under a DIFFERENT position formula — same length, misaligned
# bits, silent false negatives — so validators reject any words table
# whose scheme column is missing (pre-versioning build) or different.
BLOOM_SCHEME = "km1"


def bloom_words(
    keys: DataFrame, key_col: str, m: int = 1 << 20, k: int = 4
) -> DataFrame:
    """The MERGEABLE form of the filter: a sparse (w, bits, m, k,
    scheme) relation — word index, 64 bits of that word — holding every set bit,
    plus the filter GEOMETRY (m, k) as constant columns so a persisted
    table is self-describing: ``bloom_merge``/``bloom_assemble`` verify
    every input was built under the same (m, k) instead of inferring
    from blob length (which only catches a LARGER-m mismatch — a
    smaller-m words table zero-pads to the right length and probes
    misaligned bits: silent false negatives).

    This is the form to PERSIST for incremental pipelines: filters
    built from disjoint key batches (daily benchmark drops, per-shard
    corpora) merge by ``union -> groupBy(w) -> bit_or`` — exactly
    ``bloom_merge`` — with no rebuild from keys, the same
    re-aggregation story as the daily HLL sketches and the CMS counter
    relation.  Fully distributed: keys fan out to their k positions
    (narrow ×k map) and pack map-side-combined into ≤ m/64 rows.  No
    distinct first — bit_or is idempotent, so duplicate positions cost
    nothing while a distinct would be one more full shuffle of the
    position stream.  NULL keys are dropped explicitly, mirroring SQL
    set semantics (md5(NULL) is NULL on both engines, so a NULL key
    contributes no position either way — the filter keeps the position
    stream NULL-free and the contract self-documenting).  Nothing
    key-shaped ever reaches the driver."""
    if m % 64:
        raise ValueError(f"m must be a multiple of 64, got {m}")
    pos = keys.where(F.col(key_col).isNotNull()).select(
        F.explode(
            F.array(*[bloom_bit_pos(F.col(key_col), j, m) for j in range(k)])
        ).alias("p")
    )
    return (
        pos.groupBy((F.col("p") / F.lit(64)).cast("long").alias("w"))
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))")
            ).alias("bits")
        )
        .select(
            "w",
            "bits",
            F.lit(m).cast("long").alias("m"),
            F.lit(k).cast("int").alias("k"),
            F.lit(BLOOM_SCHEME).alias("scheme"),
        )
    )


def _check_scheme(words_df: DataFrame) -> None:
    """Reject a words table built under a different (or unversioned)
    bit-position scheme — identical geometry under a different formula
    probes misaligned bits: silent false negatives, the one failure
    mode Bloom must never have."""
    if "scheme" not in words_df.columns:
        raise ValueError(
            "words table carries no scheme column: it was persisted "
            f"under a pre-{BLOOM_SCHEME} position scheme and its bits "
            f"do not align with {BLOOM_SCHEME} probes; rebuild it with "
            "bloom_words"
        )
    schemes = {r["scheme"] for r in words_df.select("scheme").distinct().collect()}
    if schemes != {BLOOM_SCHEME}:
        raise ValueError(
            f"words table was built under position scheme(s) "
            f"{sorted(schemes)}; this build probes {BLOOM_SCHEME!r} — "
            "rebuild the table with bloom_words"
        )


def _words_geometry(words_df: DataFrame) -> tuple[int, int]:
    """Read the (m, k) geometry a words relation was built under,
    refusing a mixed table or a foreign position scheme.  The collects
    are bounded by the number of DISTINCT geometries/schemes (1 in any
    valid table), never by filter or key size."""
    _check_scheme(words_df)
    rows = words_df.select("m", "k").distinct().collect()
    if len(rows) != 1:
        geos = sorted((int(r["m"]), int(r["k"])) for r in rows)
        raise ValueError(
            f"words table mixes filters of different geometry: {geos}; "
            "merge only filters built under identical (m, k)"
        )
    return int(rows[0]["m"]), int(rows[0]["k"])


def bloom_merge(*word_tables: DataFrame) -> DataFrame:
    """OR any number of (w, bits, m, k) filters into one — a Bloom
    filter's union IS the filter of the union of the key sets,
    bit-exactly (test-pinned).  Inputs must agree on (m, k): the
    geometry columns each table carries are validated here (one bounded
    distinct), because OR-ing words of different-m filters silently
    yields false negatives — the one failure mode Bloom must never
    have."""
    if not word_tables:
        raise ValueError("bloom_merge needs at least one word table")
    # per-input scheme check BEFORE the union: a legacy table (no scheme
    # column) would otherwise surface as an opaque union-schema error
    # instead of the actionable rebuild message
    for t in word_tables:
        _check_scheme(t)
    merged = word_tables[0]
    for t in word_tables[1:]:
        merged = merged.unionByName(t)
    m, k = _words_geometry(merged)
    return (
        merged.groupBy("w")
        .agg(F.bit_or("bits").alias("bits"))
        .select(
            "w",
            "bits",
            F.lit(m).cast("long").alias("m"),
            F.lit(k).cast("int").alias("k"),
            F.lit(BLOOM_SCHEME).alias("scheme"),
        )
    )


def bloom_assemble(words_df: DataFrame, m: int | None = None) -> DataFrame:
    """Densify a sparse (w, bits) relation into the probe form: 1-row
    DataFrame with column ``bloom`` = m/8 bytes of binary, byte i
    holding bits 8i..8i+7 (bit p => byte p div 8, bit p mod 8).

    Geometry comes from the words relation itself when it carries
    (m, k) columns (anything built by ``bloom_words``/``bloom_merge``);
    a caller-passed ``m`` is then cross-checked, and a mismatch raises
    instead of zero-padding a smaller-m table to a plausible length
    (the silent-false-negative hole the old length-only guard missed).

    The assembly avoids per-element map lookups (element_at on a
    non-literal map is a linear scan — O(words²) was ~6 s at m=2^20): a
    zero row is unioned for every word index and re-folded with bit_or
    so each word appears exactly once, then array_sort on the collected
    (w, bits) structs makes position i+1 be word i by construction.
    Each word renders its 8 bytes as hex pairs in little-endian BYTE
    order (``sequence(15, 1, -2)`` walks the word's big-endian hex two
    chars at a time from the low byte), so the concatenation unhex()es
    straight into the byte layout above.  O(words log words), all
    JVM-side; the only driver-adjacent object is the m/8-byte filter
    row itself, which is the shipped payload by design
    (``bloom_literal``)."""
    if "m" in words_df.columns:
        wm, _wk = _words_geometry(words_df)
        if m is not None and m != wm:
            raise ValueError(
                f"words table was built under m={wm} but assemble was "
                f"asked for m={m}: filter built/merged under a different m"
            )
        m = wm
    elif m is None:
        raise ValueError(
            "words table carries no (m, k) geometry columns; pass m"
        )
    if m % 64:
        raise ValueError(f"m must be a multiple of 64, got {m}")
    words = m // 64
    all_words = words_df.sparkSession.range(words).select(
        F.col("id").alias("w"), F.lit(0).cast("long").alias("bits")
    )
    dense = (
        words_df.select("w", "bits")
        .unionByName(all_words)
        .groupBy("w")
        .agg(F.bit_or("bits").alias("bits"))
    )
    return _render_blob(dense)


def _render_blob(dense: DataFrame) -> DataFrame:
    """One-row blob from a DENSE (w, bits) relation (every word index
    present exactly once): array_sort makes position i+1 be word i, each
    word renders as little-endian hex pairs, unhex packs the bytes."""

    def word_le_hex(e: Column) -> Column:
        # conv(bits, 10, 16) is unsigned-64 hex (bit 63 safe), lpad to
        # 16 chars big-endian; re-pair from the tail for byte order
        h = F.lpad(F.conv(e["bits"], 10, 16), 16, "0")
        return F.array_join(
            F.transform(
                F.sequence(F.lit(15), F.lit(1), F.lit(-2)),
                lambda i: F.substring(h, i, F.lit(2)),
            ),
            "",
        )

    return dense.agg(
        F.array_sort(F.collect_list(F.struct("w", "bits"))).alias("_e")
    ).select(
        F.unhex(
            F.array_join(F.transform(F.col("_e"), word_le_hex), "")
        ).alias("bloom")
    )


def bloom_bitmap(
    keys: DataFrame, key_col: str, m: int = 1 << 20, k: int = 4
) -> DataFrame:
    """Build the probe-form filter straight from keys — semantically
    ``bloom_assemble(bloom_words(keys))``, but fused: the zero row per
    word index is injected at the POSITION level, so densify folds into
    the same groupBy that packs bits (two shuffles end-to-end instead
    of three).  Keep the sparse ``bloom_words`` relation instead when
    the filter is built incrementally (``bloom_merge``)."""
    if m % 64:
        raise ValueError(f"m must be a multiple of 64, got {m}")
    words = m // 64
    pos_bits = keys.where(F.col(key_col).isNotNull()).select(
        F.explode(
            F.array(*[bloom_bit_pos(F.col(key_col), j, m) for j in range(k)])
        ).alias("p")
    ).select(
        (F.col("p") / F.lit(64)).cast("long").alias("w"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias(
            "bits"
        ),
    )
    zeros = keys.sparkSession.range(words).select(
        F.col("id").alias("w"), F.lit(0).cast("long").alias("bits")
    )
    dense = (
        pos_bits.unionByName(zeros)
        .groupBy("w")
        .agg(F.bit_or("bits").alias("bits"))
    )
    return _render_blob(dense)


def bloom_literal(
    keys: DataFrame, key_col: str, m: int = 1 << 20, k: int = 4
) -> Column:
    """Build the filter and return it as a single BinaryType Literal —
    the form ``bloom_contains`` wants on the probe side (see module
    docstring for why a literal, and why binary)."""
    return bloom_blob_literal(bloom_bitmap(keys, key_col, m=m, k=k), m)


def bloom_blob_literal(bitmap_df: DataFrame, m: int) -> Column:
    """Collect an assembled 1-row ``bloom`` blob into a probe literal,
    refusing a blob whose length disagrees with ``m`` — a words table
    built (or merged) under a DIFFERENT m assembles to the wrong length
    and would otherwise probe misaligned bytes, i.e. silent FALSE
    NEGATIVES, the one failure mode a Bloom filter must never have."""
    blob = bytes(bitmap_df.collect()[0]["bloom"])
    if len(blob) != m // 8:
        raise ValueError(
            f"bloom blob is {len(blob)} bytes but m={m} implies {m // 8}: "
            "filter built/merged under a different m"
        )
    return F.lit(blob)


def bloom_blob_from_words(
    words_df: DataFrame, m: int | None = None, k: int | None = None
) -> Column:
    """Probe literal straight from a persisted words relation, packed on
    the DRIVER: one job collects the sparse (w, bits, m, k) rows —
    bounded at m/64 rows × 16 bytes, the same O(m)-payload contract as
    ``bloom_literal``'s one-row blob fetch, never key-count-shaped —
    and Python ORs duplicates (per-batch appends) and renders the m/8
    bytes directly.  Bit-equal to ``bloom_assemble`` + collect
    (test-pinned) but with ZERO shuffles and no separate geometry job:
    the geometry columns ride in the same collect and are validated
    against the caller's (m, k) expectation here.  This is the hot path
    for a probe-only decontamination run; keep ``bloom_assemble`` when
    the blob itself must stay a relation (e.g. written to a table)."""
    if "scheme" not in words_df.columns:
        raise ValueError(
            "words table carries no scheme column: it was persisted "
            f"under a pre-{BLOOM_SCHEME} position scheme and its bits "
            f"do not align with {BLOOM_SCHEME} probes; rebuild it with "
            "bloom_words"
        )
    rows = words_df.select("w", "bits", "m", "k", "scheme").collect()
    schemes = {r["scheme"] for r in rows}
    if schemes and schemes != {BLOOM_SCHEME}:
        raise ValueError(
            f"words table was built under position scheme(s) "
            f"{sorted(schemes)}; this build probes {BLOOM_SCHEME!r} — "
            "rebuild the table with bloom_words"
        )
    geos = {(int(r["m"]), int(r["k"])) for r in rows}
    if len(geos) > 1:
        raise ValueError(
            f"words table mixes filters of different geometry: {sorted(geos)}; "
            "merge only filters built under identical (m, k)"
        )
    if geos:
        wm, wk = geos.pop()
        if m is not None and m != wm:
            raise ValueError(
                f"words table was built under m={wm} but probe expects "
                f"m={m}: filter built/merged under a different m"
            )
        if k is not None and k != wk:
            raise ValueError(
                f"words table was built under k={wk} but probe expects k={k}"
            )
        m = wm
    elif m is None:
        raise ValueError("empty words table and no m given")
    if m % 64:
        raise ValueError(f"m must be a multiple of 64, got {m}")
    words = [0] * (m // 64)
    for r in rows:
        words[int(r["w"])] |= int(r["bits"]) & 0xFFFFFFFFFFFFFFFF
    blob = b"".join(wd.to_bytes(8, "little") for wd in words)
    return F.lit(blob)


def bloom_words_collector(key_col: str, path: str, m: int = 1 << 20, k: int = 4):
    """foreachBatch hook for INCREMENTAL filter maintenance: each
    micro-batch of new benchmark keys lands its own (w, bits, m, k,
    scheme) words relation under ``path`` — nothing is rebuilt from
    keys, ever.  Readers get the merged filter for free:
    ``bloom_assemble`` over ``bloom_words_read(path)`` folds the
    per-batch rows with the same bit_or the explicit ``bloom_merge``
    uses (OR is associative), and the carried geometry/scheme columns
    reject a mixed-(m, k) or foreign-scheme append.  Gate refresh is
    the reader's choice — re-assemble when the table grows (cheap:
    O(m/64) rows), keep probing the old literal otherwise.

    Concurrency contract: each batch writes to a dot-prefixed tmp
    directory (invisible to Spark readers) and is atomically RENAMED to
    ``batch-<id>`` — so a concurrent reader sees whole batches or
    nothing, never a half-committed file set (a torn read would pack a
    literal missing some of the batch's bits: false negatives).  Rename
    is atomic on local/HDFS paths; on object stores swap the rename for
    a commit-marker ( _SUCCESS-gated read), same contract.  Delivery is
    at-least-once-safe twice over: a replayed batch finds its committed
    directory and skips, and even a duplicate append would only re-OR
    identical bits."""
    import os
    import shutil

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        final = os.path.join(path, f"batch-{batch_id}")
        if os.path.isdir(final):
            return  # replayed batch: already committed
        tmp = os.path.join(path, f".batch-{batch_id}.tmp")
        bloom_words(batch_df, key_col, m=m, k=k).write.mode(
            "overwrite"
        ).parquet(tmp)
        try:
            os.rename(tmp, final)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # lost a concurrent race

    return write_batch


def bloom_words_read(spark, path: str) -> DataFrame:
    """Snapshot-consistent read of a collector-maintained words
    directory: recursiveFileLookup picks up every committed
    ``batch-<id>`` subdirectory while Spark's hidden-path rule skips the
    dot-prefixed tmp dirs still being written — the read half of
    ``bloom_words_collector``'s whole-batches-or-nothing contract."""
    return spark.read.option("recursiveFileLookup", "true").parquet(path)


def bloom_contains(
    key: Column, bitmap: Column, m: int = 1 << 20, k: int = 4
) -> Column:
    """True iff every one of ``key``'s k bits is set in ``bitmap`` (the
    binary form) — the standard Bloom probe, as pure column expressions
    (JVM-side, whole-stage codegen; no UDF, no join).  Binary substring
    is an O(1) single-byte slice; hex+conv lifts the byte to a long for
    getbit."""

    def bit_set(j: int) -> Column:
        p = bloom_bit_pos(key, j, m)
        byte = F.substring(
            bitmap, (p / F.lit(8)).cast("int") + F.lit(1), F.lit(1)
        )
        return F.getbit(F.conv(F.hex(byte), 16, 10).cast("long"), p % 8) == 1

    probe = reduce(lambda a, b: a & b, [bit_set(j) for j in range(k)])
    # a NULL key is not a member (matches the build side dropping NULLs):
    # md5(NULL) propagates NULL through the probe, and NULL & ... must
    # resolve to False, not NULL, for a membership predicate
    return key.isNotNull() & probe
