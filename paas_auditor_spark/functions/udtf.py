"""Python UDTF surface (Spark 4): the table-function extension point.

The reference has no UDF surface at all (SURVEY.md §2.8); the engine's
extension points are, in preference order:
1. built-in column expressions (everything relational),
2. Arrow-batched pandas UDF / mapInPandas (multimodal feature extraction),
3. **Python UDTFs** (this module) — one input row → many output rows with
   per-row Python logic, consumed via LATERAL join.  The row fan-out shape
   that explode() handles for array columns, generalized to arbitrary
   generators (tokenizers, parsers, samplers).

UDTFs are the slowest path (per-row Python, though Arrow-batched when
``spark.sql.execution.pythonUDTF.arrow.enabled`` is on) — the n-gram UDTF
here deliberately duplicates what ``shingles()`` does JVM-side, so tests
can pin that both paths agree and the catalog documents when to pick
which: UDTF only when the generator logic can't be expressed with
built-ins.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="ngram string")
class NGramsUDTF:
    """Emit whitespace-token n-grams of the (normalized) input text."""

    def eval(self, text: str, n: int):  # noqa: D102 — UDTF contract
        toks = (text or "").strip().lower().split()
        for i in range(len(toks) - n + 1):
            yield (" ".join(toks[i : i + n]),)


class SplitFieldsUDTF:
    """Polymorphic UDTF (Spark 4 ``analyze``): splits a delimited string
    into N named columns where N is decided AT PLAN TIME from a constant
    argument — the dynamic-schema half of the §2.8 extension surface
    (static-schema UDTFs can't change arity per call site).

    ``analyze`` receives the literal arguments during resolution and
    returns the output schema; ``eval`` then emits matching tuples.
    Used for fixed-layout log/line formats where the column count is a
    property of the call, not the data.
    """

    @staticmethod
    def analyze(*args):
        from pyspark.sql.functions import AnalyzeResult
        from pyspark.sql.types import StringType, StructType

        n = args[2].value  # constant column count
        schema = StructType()
        for i in range(n):
            schema = schema.add(f"f{i}", StringType())
        return AnalyzeResult(schema=schema)

    def eval(self, line: str, sep: str, n: int):  # noqa: D102
        parts = (line or "").split(sep)
        parts = (parts + [""] * n)[:n]
        yield tuple(parts)


def register_udtfs(spark) -> None:
    """Idempotently register the engine's UDTFs in the session catalog."""
    from pyspark.sql.functions import udtf as _udtf

    spark.udtf.register("ngrams_udtf", NGramsUDTF)
    spark.udtf.register("split_fields", _udtf(SplitFieldsUDTF))


__all__ = ["NGramsUDTF", "SplitFieldsUDTF", "register_udtfs"]
