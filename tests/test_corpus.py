"""Corpus-level curation operators: segment dedup, bigram-LM perplexity,
temperature sampling (operators/corpus.py)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import types as T

from paas_auditor_spark.operators.corpus import (
    bigram_lm_perplexity,
    segment_dedup,
    temperature_sample,
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)

SHARED = "one two three four five six seven eight"  # exactly one 8-word window


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, SHARED + " unique tail words here", "s0"),
        (1, SHARED + " different ending entirely now", "s0"),
        (2, "totally fresh text with no overlap at all", "s1"),
    ]
    return spark.createDataFrame(rows, DOC_SCHEMA)


def test_segment_dedup_drops_cross_doc_windows(docs):
    out = {r["doc_id"]: r for r in segment_dedup(docs, width=8).collect()}
    # docs 0 and 1: segment 1 is SHARED (in both) → dropped; segment 2 is
    # the 4-word tail (unique) → kept
    for d, tail in [(0, "unique tail words here"), (1, "different ending entirely now")]:
        assert out[d]["n_segments"] == 2
        assert out[d]["n_dup_segments"] == 1
        assert out[d]["dup_frac"] == 0.5
        assert out[d]["clean_text"] == tail
    assert out[2]["n_dup_segments"] == 0
    assert out[2]["clean_text"] == "totally fresh text with no overlap at all"


def test_segment_dedup_preserves_segment_order(spark):
    # two duplicated windows sandwiching a unique one: surviving text must
    # keep original order, not collect_list arrival order
    a = "w1 w2 w3 w4 w5 w6 w7 w8"
    b = "x1 x2 x3 x4 x5 x6 x7 x8"
    mid = "keep these middle words in order yes ok"  # exactly 8 words
    rows = [
        (0, f"{a} {mid} {b}", "s"),
        (1, f"{b} {a}", "s"),
    ]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    out = {r["doc_id"]: r for r in segment_dedup(df, width=8).collect()}
    assert out[0]["clean_text"] == mid
    assert out[1]["clean_text"] == ""
    assert out[1]["dup_frac"] == 1.0


def test_bigram_lm_perplexity_matches_hand_computation(spark):
    # corpus: "a b a b" and "a c" → V=3
    # C1: a=3, b=2(only as w1: "b a"→1... count by w1 occurrences in bigrams)
    # bigrams: doc0: (a,b) (b,a) (a,b); doc1: (a,c)
    # C2: (a,b)=2, (b,a)=1, (a,c)=1;  C1(w1): a=3, b=1
    rows = [(0, "a b a b", "s"), (1, "a c", "s")]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    out = {r["doc_id"]: r for r in bigram_lm_perplexity(df).collect()}
    v = 3
    p_ab = (2 + 1) / (3 + v)
    p_ba = (1 + 1) / (1 + v)
    p_ac = (1 + 1) / (3 + v)
    nll0 = -(2 * math.log(p_ab) + 1 * math.log(p_ba)) / 3
    nll1 = -math.log(p_ac)
    assert out[0]["n_bigrams"] == 3
    assert out[0]["avg_nll"] == round(nll0, 4)
    assert out[0]["ppl"] == round(math.exp(nll0), 4)
    assert out[1]["n_bigrams"] == 1
    assert out[1]["ppl"] == round(math.exp(nll1), 4)


def test_bigram_lm_short_doc_gets_null_scores(spark):
    rows = [(0, "solo", "s"), (1, "a b", "s")]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    out = {r["doc_id"]: r for r in bigram_lm_perplexity(df).collect()}
    assert out[0]["n_bigrams"] == 0
    assert out[0]["ppl"] is None
    assert out[1]["n_bigrams"] == 1


def test_temperature_sample_quotas_and_determinism(spark):
    # sources sized 9/4/1, alpha=0.5 → weights 3/2/1; T = 0.5*14 = 7
    # quotas: floor(7*3/6)=3, floor(7*2/6)=2, floor(7*1/6)=1
    rows = [(i, f"doc {i}", "big") for i in range(9)]
    rows += [(100 + i, f"doc {100+i}", "mid") for i in range(4)]
    rows += [(200, "doc 200", "small")]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    out = temperature_sample(df, alpha=0.5, target_frac=0.5).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    assert {r["quota"] for r in by_src["big"]} == {3}
    assert {r["quota"] for r in by_src["mid"]} == {2}
    assert {r["quota"] for r in by_src["small"]} == {1}
    # kept = lowest doc_ids per source, exactly quota of them
    kept = sorted(r["doc_id"] for r in out if r["kept"])
    assert kept == [0, 1, 2, 100, 101, 200]
    # small sources are UPWEIGHTED relative to their share: small keeps
    # 100% (1/1), big only 33% (3/9) — the alpha<1 contract
    assert len([r for r in by_src["big"] if r["kept"]]) / 9 < 1.0


def test_dsir_scores_favor_target_like_docs(spark):
    """Docs sharing the target's vocabulary get a higher log-likelihood
    ratio than off-domain docs; values match an independent numpy
    replay of the closed form (same md5 bucketing)."""
    import hashlib
    import math

    from paas_auditor_spark.operators.corpus import dsir_scores

    target = spark.createDataFrame(
        [(100, "quantum physics entanglement qubit decoherence"),
         (101, "qubit gate quantum circuit physics")],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [(1, "quantum qubit physics experiment"),
         (2, "football league cup final replay"),
         (3, "qubit")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["log_ratio"])
        for r in dsir_scores(raw, target, buckets=64).collect()
    }

    def bucket(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % 64

    tgt_toks = [w for _, t in [(100, "quantum physics entanglement qubit decoherence"), (101, "qubit gate quantum circuit physics")] for w in t.lower().split()]
    raw_rows = [(1, "quantum qubit physics experiment"), (2, "football league cup final replay"), (3, "qubit")]
    raw_toks = [w for _, t in raw_rows for w in t.lower().split()]
    ct, cr = {}, {}
    for w in tgt_toks:
        ct[bucket(w)] = ct.get(bucket(w), 0) + 1
    for w in raw_toks:
        cr[bucket(w)] = cr.get(bucket(w), 0) + 1
    nt, nr = len(tgt_toks), len(raw_toks)
    for doc_id, text in raw_rows:
        lr = sum(
            math.log((ct.get(bucket(w), 0) + 1) / (nt + 64))
            - math.log((cr.get(bucket(w), 0) + 1) / (nr + 64))
            for w in text.lower().split()
        )
        n, got_lr = got[doc_id]
        assert n == len(text.split())
        assert abs(got_lr - round(lr, 4)) < 1e-9, (doc_id, got_lr, lr)
    # in-domain doc outranks the off-domain one
    assert got[1][1] > got[2][1]


def test_bpe_merge_table_matches_reference(spark):
    """Classic Sennrich corpus: learned merges equal an independent
    pure-Python BPE trainer (greedy left-to-right merge application,
    lexicographic tie-break)."""
    from collections import Counter

    from paas_auditor_spark.operators.corpus import bpe_merge_table

    texts = ["low low low lower lowest", "new newer newest low"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["cnt"])
        for r in bpe_merge_table(df, n_merges=6).orderBy("merge_rank").collect()
    ]

    wc = Counter(w for t in texts for w in t.lower().split())
    syms = {w: list(w) for w in wc}
    want = []
    for rank in range(1, 7):
        pc = Counter()
        for w, f in wc.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        (p1, p2), cnt = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        want.append((rank, p1, p2, cnt))
        for w in syms:
            out = []
            for c in syms[w]:
                if out and out[-1] == p1 and c == p2:
                    out[-1] = p1 + p2
                else:
                    out.append(c)
            syms[w] = out
    assert got == want


def test_bpe_segment_final_vocabulary(spark):
    """bpe_segment returns the word table re-segmented by all learned
    merges — checked against the same pure-Python trainer's final state."""
    from collections import Counter

    from paas_auditor_spark.operators.corpus import bpe_segment

    texts = ["low low low lower lowest", "new newer newest low"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["w"]: (r["freq"], list(r["syms"]))
        for r in bpe_segment(df, n_merges=6).collect()
    }

    wc = Counter(w for t in texts for w in t.lower().split())
    syms = {w: list(w) for w in wc}
    for _ in range(6):
        pc = Counter()
        for w, f in wc.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        (p1, p2), _cnt = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        for w in syms:
            out = []
            for c in syms[w]:
                if out and out[-1] == p1 and c == p2:
                    out[-1] = p1 + p2
                else:
                    out.append(c)
            syms[w] = out
    assert got == {w: (wc[w], syms[w]) for w in wc}


def test_bpe_stops_when_merges_exhaust(spark):
    """A corpus fully merged before n_merges rounds returns the merges
    that exist and the final segmentation — not an empty table
    (regression: crossJoin against an empty argmax wiped the words)."""
    from paas_auditor_spark.operators.corpus import (
        bpe_merge_table,
        bpe_segment,
    )

    df = spark.createDataFrame(
        [(1, "ab ab ab")], "doc_id long, text string"
    )
    got = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["cnt"])
        for r in bpe_merge_table(df, n_merges=5).orderBy("merge_rank").collect()
    ]
    assert got == [(1, "a", "b", 3)]  # one merge, then nothing left
    seg = bpe_segment(df, n_merges=5).collect()
    assert [(r["w"], r["freq"], list(r["syms"])) for r in seg] == [
        ("ab", 3, ["ab"])
    ]


def test_fim_transform_reassembles_to_original(spark, sf_dir):
    """FIM is a permutation, not a lossy rewrite: for every transformed
    document, prefix + middle + suffix must reconstruct the original
    text exactly (PSM order carries middle last); untransformed docs
    pass through verbatim; the gate hits a sane fraction."""
    import re

    from paas_auditor_spark.queries import q_fim_transform
    from paas_auditor_spark.sources.tables import load_table

    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    out = q_fim_transform(spark, sf_dir).collect()
    n_applied = 0
    pat = re.compile(r"\A<PRE>(.*)<SUF>(.*)<MID>(.*)\Z", re.S)
    for r in out:
        if not r["fim_applied"]:
            assert r["fim_text"] == docs[r["doc_id"]]
            continue
        n_applied += 1
        m = pat.match(r["fim_text"])
        assert m, r["fim_text"][:80]
        prefix, suffix, middle = m.groups()
        assert prefix + middle + suffix == docs[r["doc_id"]]
    assert 0.3 < n_applied / len(out) < 0.7


def test_mixture_weights_simplex_and_beats_uniform(spark, sf_dir):
    """Fitted weights live on the simplex and their blend is at least
    as close (L2 over hashed-unigram buckets) to the target source's
    distribution as the uniform blend."""
    import numpy as np
    from pyspark.sql import functions as F

    from paas_auditor_spark.functions.text import tokens
    from paas_auditor_spark.operators.corpus import mixture_weights
    from paas_auditor_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = {r["source"]: r["weight"] for r in mixture_weights(docs, "src0").collect()}
    assert "src0" not in out and len(out) >= 2
    assert all(w >= 0 for w in out.values())
    assert abs(sum(out.values()) - 1.0) < 1e-4

    def bucket_dist(src):
        rows = (
            docs.where(F.col("source") == src)
            .select(F.explode(tokens(F.lower(F.col("text")))).alias("w"))
            .filter(F.length("w") >= 1)
            .select(
                (
                    F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast(
                        "long"
                    )
                    % 64
                ).alias("b")
            )
            .groupBy("b")
            .count()
            .collect()
        )
        v = np.zeros(64)
        for r in rows:
            v[r["b"]] = r["count"]
        return v / v.sum()

    target = bucket_dist("src0")
    dists = {s: bucket_dist(s) for s in out}
    fitted = sum(out[s] * dists[s] for s in out)
    uniform = sum(dists[s] for s in out) / len(out)
    assert np.linalg.norm(fitted - target) <= np.linalg.norm(
        uniform - target
    ) + 1e-12

    with __import__("pytest").raises(ValueError, match="target source"):
        mixture_weights(docs, "no_such_source")


def test_persisted_lm_equals_in_query_and_handles_oov(spark, tmp_path, sf_dir):
    """VERDICT r7 #3: the persisted trigram LM (counts collector →
    finalize → probe-only scoring) must be value-identical to the
    in-query operator on indexed documents, accumulate counts
    ADDITIVELY across batches with replay protection, and still score
    documents containing trigrams the model never saw (zero-floor
    backoff) instead of dropping or crashing."""
    from pyspark.sql import functions as F

    from paas_auditor_spark.operators.corpus import (
        lm_counts_collector,
        lm_index_finalize,
        trigram_interp_perplexity,
        trigram_interp_perplexity_from_model,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)

    counts = str(tmp_path / "counts")
    hook = lm_counts_collector(counts)
    hook(half_a, 0)
    hook(half_b, 1)
    hook(half_b.limit(3), 1)  # replay: must not double-count
    model = str(tmp_path / "model")
    lm_index_finalize(spark, counts, model)

    got = (
        trigram_interp_perplexity_from_model(spark, model, docs)
        .orderBy("doc_id")
        .collect()
    )
    want = trigram_interp_perplexity(docs).orderBy("doc_id").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]

    # out-of-corpus doc: trigrams unseen by the model → finite zero-floor
    # scores, never a dropped row or NULL ppl
    novel = spark.createDataFrame(
        [(999_999, "zzqx vvwp kkjh zzqx vvwp")], "doc_id long, text string"
    )
    row = trigram_interp_perplexity_from_model(spark, model, novel).collect()[0]
    assert row.n_trigrams == 3
    assert row.ppl is not None and math.isfinite(row.ppl) and row.ppl > 0


def test_lm_retraction_equals_never_ingested(spark, tmp_path, sf_dir):
    """Additive deletion: ingest everything, retract a subset
    (lm_counts_collector retract=True), finalize — the model must score
    EVERY document identically to a model trained only on the
    survivors (counts, marginals, vocab size and total all net out)."""
    from pyspark.sql import functions as F

    from paas_auditor_spark.operators.corpus import (
        lm_counts_collector,
        lm_index_finalize,
        trigram_interp_perplexity_from_model,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(80)
    )
    doomed = F.col("doc_id") % 3 == 1
    counts = str(tmp_path / "counts")
    hook = lm_counts_collector(counts)
    hook(docs.filter(F.col("doc_id") % 2 == 0), 0)
    hook(docs.filter(F.col("doc_id") % 2 == 1), 1)
    lm_counts_collector(counts, retract=True)(docs.filter(doomed), 2)
    lm_counts_collector(counts, retract=True)(docs.filter(doomed), 2)
    # ^ replayed retraction batch: replay protection must keep it a
    # no-op (a double-subtract would push counts negative)
    model = str(tmp_path / "model")
    lm_index_finalize(spark, counts, model)

    clean_counts = str(tmp_path / "clean_counts")
    lm_counts_collector(clean_counts)(docs.filter(~doomed), 0)
    clean_model = str(tmp_path / "clean_model")
    lm_index_finalize(spark, clean_counts, clean_model)

    got = trigram_interp_perplexity_from_model(
        spark, model, docs
    ).orderBy("doc_id").collect()
    want = trigram_interp_perplexity_from_model(
        spark, clean_model, docs
    ).orderBy("doc_id").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_lm_retraction_of_never_ingested_raises(spark, tmp_path):
    """The retraction contract is loud: retracting content that was
    never ingested (or retracting twice under distinct batch ids) nets
    a count negative, and finalize refuses to build a silently
    corrupted model."""
    import pytest

    from paas_auditor_spark.operators.corpus import (
        lm_counts_collector,
        lm_index_finalize,
    )

    counts = str(tmp_path / "counts")
    ingested = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    foreign = spark.createDataFrame(
        [(2, "completely different words entirely here")],
        "doc_id long, text string",
    )
    lm_counts_collector(counts)(ingested, 0)
    lm_counts_collector(counts, retract=True)(foreign, 1)
    with pytest.raises(ValueError, match="negative net counts"):
        lm_index_finalize(spark, counts, str(tmp_path / "model"))


def test_lm_finalize_reads_legacy_distinct_vocab(spark, tmp_path):
    """Pre-retraction datasets stored vocab as distinct (w) rows; the
    finalize's legacy branch must still count them correctly."""
    from paas_auditor_spark.operators.atomic import commit_batch_dir
    from paas_auditor_spark.operators.corpus import (
        lm_counts_collector,
        lm_index_finalize,
        trigram_interp_perplexity_from_model,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma alpha beta gamma delta")],
        "doc_id long, text string",
    )
    counts = str(tmp_path / "counts")
    lm_counts_collector(counts)(docs, 0)
    # rewrite the vocab part into the LEGACY (w)-only format
    import shutil

    legacy = spark.read.parquet(f"{counts}/batch-0/vocab").select("w")
    legacy_pdf = legacy.toPandas()
    shutil.rmtree(f"{counts}/batch-0")

    def write(tmp):
        spark.createDataFrame(legacy_pdf).write.parquet(f"{tmp}/vocab")
        spark.createDataFrame(
            [("alpha", "beta", "gamma", 2), ("beta", "gamma", "alpha", 1),
             ("gamma", "alpha", "beta", 1), ("beta", "gamma", "delta", 1)],
            "w1 string, w2 string, w3 string, c3 long",
        ).write.parquet(f"{tmp}/trigrams")

    commit_batch_dir(counts, 0, write)
    model = str(tmp_path / "model")
    lm_index_finalize(spark, counts, model)
    meta = spark.read.parquet(f"{model}/meta").collect()[0]
    assert meta["v"] == 4  # alpha beta gamma delta
    row = trigram_interp_perplexity_from_model(spark, model, docs).collect()[0]
    assert row["n_trigrams"] == 5


@pytest.mark.parametrize("legacy_first", [False, True])
def test_lm_finalize_refuses_mixed_vocab_formats(
    spark, tmp_path, legacy_first
):
    """A dataset mixing legacy (w)-only and counted (w, c) vocab
    batches nulls the c column for the legacy rows at read time — sums
    would silently skip them, so finalize must refuse loudly.  BOTH
    batch orders: without mergeSchema Spark infers the vocab schema
    from one arbitrary file, and a legacy batch sorting first came back
    (w)-only — the c column vanished and the guard was silently
    bypassed (measured before the fix), the order this parametrization
    pins."""
    import pytest

    from paas_auditor_spark.operators.atomic import commit_batch_dir
    from paas_auditor_spark.operators.corpus import (
        lm_counts_collector,
        lm_index_finalize,
    )

    counts = str(tmp_path / "counts")
    legacy_id, counted_id = (0, 1) if legacy_first else (1, 0)
    lm_counts_collector(counts)(
        spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon")],
            "doc_id long, text string",
        ),
        counted_id,
    )

    def write_legacy(tmp):
        spark.createDataFrame([("zeta",), ("eta",)], "w string").write.parquet(
            f"{tmp}/vocab"
        )
        spark.createDataFrame(
            [("zeta", "eta", "zeta", 1)],
            "w1 string, w2 string, w3 string, c3 long",
        ).write.parquet(f"{tmp}/trigrams")

    commit_batch_dir(counts, legacy_id, write_legacy)
    with pytest.raises(ValueError, match="mixes legacy"):
        lm_index_finalize(spark, counts, str(tmp_path / "model"))


def test_lm_counts_compaction_invisible_to_finalize(spark, tmp_path, sf_dir):
    """The LM counts dataset is a collector-family member: generational
    compaction (a row-preserving rewrite) must leave the finalized model
    — and therefore every score — bit-identical."""
    from pyspark.sql import functions as F

    from paas_auditor_spark.operators.atomic import compact_batches
    from paas_auditor_spark.operators.corpus import (
        lm_counts_collector,
        lm_index_finalize,
        trigram_interp_perplexity_from_model,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(60)
    )
    counts = str(tmp_path / "counts")
    hook = lm_counts_collector(counts)
    for i in range(3):
        hook(docs.filter(F.col("doc_id") % 3 == i), i)

    before_model = str(tmp_path / "m1")
    lm_index_finalize(spark, counts, before_model)
    before = trigram_interp_perplexity_from_model(
        spark, before_model, docs
    ).collect()

    assert compact_batches(spark, counts, parts=("trigrams", "vocab")) == 3
    after_model = str(tmp_path / "m2")
    lm_index_finalize(spark, counts, after_model)
    after = trigram_interp_perplexity_from_model(
        spark, after_model, docs
    ).collect()
    assert [tuple(r) for r in before] == [tuple(r) for r in after]


def test_lm_counts_collector_under_real_stream(spark, tmp_path):
    """lm_counts_collector as an actual Structured Streaming sink: a
    document stream lands batch-by-batch through foreachBatch, a
    finalize after each wave trains the model over everything landed so
    far, and scoring matches the in-query LM over the same union —
    continuous ingest keeps the LM trainable with no re-tokenize of
    landed documents."""
    import os

    from paas_auditor_spark.operators.corpus import (
        lm_counts_collector,
        lm_index_finalize,
        trigram_interp_perplexity,
        trigram_interp_perplexity_from_model,
    )

    src = str(tmp_path / "src")
    counts = str(tmp_path / "counts")
    os.makedirs(src)
    wave1 = [(1, "the cat sat on the mat"), (2, "the dog sat on the rug")]
    wave2 = [(3, "a cat and a dog sat down"), (4, "the mat sat still")]
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    mk(wave1).coalesce(1).write.mode("append").parquet(src)

    def run_stream():
        q = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(lm_counts_collector(counts))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def model_scores(model_dir, docs):
        return [
            tuple(r)
            for r in trigram_interp_perplexity_from_model(
                spark, model_dir, docs
            ).orderBy("doc_id").collect()
        ]

    run_stream()
    lm_index_finalize(spark, counts, str(tmp_path / "m1"))
    want1 = [
        tuple(r)
        for r in trigram_interp_perplexity(mk(wave1)).orderBy("doc_id").collect()
    ]
    assert model_scores(str(tmp_path / "m1"), mk(wave1)) == want1

    mk(wave2).coalesce(1).write.mode("append").parquet(src)
    run_stream()  # restart from checkpoint: only the new file lands
    lm_index_finalize(spark, counts, str(tmp_path / "m2"))
    union = mk(wave1 + wave2)
    want2 = [
        tuple(r)
        for r in trigram_interp_perplexity(union).orderBy("doc_id").collect()
    ]
    assert model_scores(str(tmp_path / "m2"), union) == want2


def test_lm_sharded_batch_probe_geometry(spark, sf_dir):
    """The per-ingest-batch scorer (batch_probe=True) must be
    value-identical to the default geometry on the same batch, and its
    static plan must carry ZERO sort-merge joins — the model relation
    is map-scanned via broadcast semi/hash joins, never shuffled (the
    deployment difference: the default geometry sort-merges the full
    model per batch)."""
    from pyspark.sql import functions as F

    from paas_auditor_spark.operators.corpus import (
        trigram_interp_perplexity_from_model,
    )
    from paas_auditor_spark.queries import (
        _INGEST_BATCH_PRED,
        _lm_model_cached,
    )

    model = _lm_model_cached(spark, sf_dir)
    batch = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.expr(_INGEST_BATCH_PRED))
    )
    fast = trigram_interp_perplexity_from_model(
        spark, model, batch, batch_probe=True
    )
    slow = trigram_interp_perplexity_from_model(spark, model, batch)
    # read the plan BEFORE executing: post-collect, AdaptiveSparkPlan's
    # toString prints initial+final trees and double-counts exchanges
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert [tuple(r) for r in fast.collect()] == [
        tuple(r) for r in slow.collect()
    ]
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    # the only shuffles allowed are the four batch-derived ones (the
    # w2/w3 key distincts, the per-doc aggregate, the final sort); any
    # join of the model/marginal relations flipping off broadcast adds
    # exchanges on BOTH sides, so pinning the count catches a shuffle
    # of b2/u3/model that column-name checks cannot distinguish from
    # the batch streams' own keys
    shuffles = [
        line
        for line in plan.splitlines()
        if "Exchange" in line and "Broadcast" not in line
    ]
    assert len(shuffles) <= 4, shuffles
    for line in shuffles:
        assert "c3" not in line and "n_total" not in line, line
