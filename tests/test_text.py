"""Text-function unit tests: pinned values on constructed strings (the
exact-semantics backstop for the rows-only registered queries)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from paas_auditor_spark.functions import text as tx


def _one(spark, s: str, col):
    return (
        spark.createDataFrame([(s,)], "text string")
        .select(col(F.col("text")).alias("v"))
        .first()["v"]
    )


def test_token_count_whitespace(spark):
    assert _one(spark, "a  b\tc\nd", tx.token_count) == 4
    assert _one(spark, "  one  ", tx.token_count) == 1


def test_bpe_ish_token_count_splits_boundaries(spark):
    # word/punct/digit boundaries: "don't" -> don | ' | t ; "v2" -> v | 2
    assert _one(spark, "don't", tx.bpe_ish_token_count) == 3
    assert _one(spark, "v2", tx.bpe_ish_token_count) == 2
    assert _one(spark, "hello world", tx.bpe_ish_token_count) == 2
    assert _one(spark, "a,b", tx.bpe_ish_token_count) == 3


def test_stopword_count_case_insensitive(spark):
    assert _one(spark, "The cat and THE dog", tx.stopword_count) == 3


def test_punct_and_quality(spark):
    assert _one(spark, "Hi, there! ok", tx.punct_count) == 2
    feats = {
        n: c
        for n, c in tx.quality_features(F.col("text")).items()
    }
    row = (
        spark.createDataFrame([("ab cd!",)], "text string")
        .select(*[c.alias(n) for n, c in feats.items()])
        .first()
    )
    assert row["n_chars_calc"] == 6
    assert row["n_tokens"] == 2
    assert row["n_punct"] == 1


def test_fingerprint_normalization_invariance(spark):
    a = _one(spark, "  Hello   World ", tx.fingerprint)
    b = _one(spark, "hello world", tx.fingerprint)
    c = _one(spark, "hello worlds", tx.fingerprint)
    assert a == b and len(a) == 16
    assert a != c


@pytest.mark.parametrize(
    ("s", "want"),
    [
        ("the cat is on the mat and happy", "en"),
        ("el perro de la casa que ladra", "es"),
        ("der Hund und die Katze und das", "de"),
        ("xyzzy qwerty plugh", "und"),
    ],
)
def test_lang_id_heuristic(spark, s, want):
    assert _one(spark, s, tx.lang_id) == want


def test_udtf_ngrams_agrees_with_jvm_shingles(spark):
    """The Python UDTF fan-out and the JVM shingle path produce identical
    bigram multisets — the documented 'prefer built-ins' contract."""
    from pyspark.sql import functions as F

    from paas_auditor_spark.functions.udtf import register_udtfs
    from paas_auditor_spark.operators.dedup import shingles

    register_udtfs(spark)
    docs = spark.createDataFrame(
        [(1, "The  quick brown fox"), (2, "brown fox  jumps"), (3, "x")],
        "doc_id long, text string",
    )
    docs.createOrReplaceTempView("udtf_test_docs")
    via_udtf = spark.sql(
        "SELECT ngram, count(*) AS n FROM udtf_test_docs, "
        "LATERAL ngrams_udtf(text, 2) GROUP BY ngram"
    )
    via_jvm = (
        docs.select(F.explode(shingles("text", k=2)).alias("ngram"))
        .filter(F.size(F.split(F.col("ngram"), " ")) == 2)  # drop <k fallback rows
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, via_udtf.collect())) == sorted(
        map(tuple, via_jvm.collect())
    )


def test_ngrams_and_repetition_ratio(spark):
    # "a b a b a" bigrams: [a b, b a, a b, b a] -> 4 total, 2 distinct
    got = _one(spark, "a b a b a", lambda c: tx.ngrams(c, 2))
    assert got == ["a b", "b a", "a b", "b a"]
    assert _one(spark, "a b a b a", tx.repetition_ratio) == pytest.approx(0.5)
    # all-unique bigrams -> 0.0; sub-n-token docs -> 0.0 (empty gram array)
    assert _one(spark, "x y z", tx.repetition_ratio) == 0.0
    assert _one(spark, "solo", tx.repetition_ratio) == 0.0
    # case-insensitive: "A b a B" bigrams all lowercase
    got = _one(spark, "A b a B", lambda c: tx.ngrams(c, 2))
    assert got == ["a b", "b a", "a b"]


def test_polymorphic_udtf_analyze_schema(spark):
    """SplitFieldsUDTF: the output schema is decided at plan time from
    the constant column-count argument (Spark 4 analyze contract)."""
    from paas_auditor_spark.functions.udtf import register_udtfs

    register_udtfs(spark)
    three = spark.sql("SELECT * FROM split_fields('a|b|c', '|', 3)")
    four = spark.sql("SELECT * FROM split_fields('x|y', '|', 4)")
    assert three.columns == ["f0", "f1", "f2"]
    assert four.columns == ["f0", "f1", "f2", "f3"]
    assert tuple(three.first()) == ("a", "b", "c")
    assert tuple(four.first()) == ("x", "y", "", "")  # padded, not dropped
