"""Scalar (int8) embedding quantization with reconstruction diagnostics.

At 100 TB an `array<float>` embedding column dominates storage and
shuffle width; per-vector symmetric int8 quantization (the FAISS ``SQ8``
shape) cuts it 4× while keeping ANN recall high.  Everything here is JVM
higher-order functions over the array column — a narrow map, no shuffle,
no Python:

- ``scale(v)   = max(|v_i|) / 127``  (per-vector symmetric range)
- ``codes(v)   = round(v_i / scale)``  (int8-representable -127..127)
- ``recon(c,s) = c_i * s``

``reconstruction_report`` aggregates per-label quantization quality —
mean L2 reconstruction error and mean cosine(original, reconstructed) —
the drift numbers a curation pipeline tracks before switching its ANN
index to quantized vectors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from paas_auditor_spark.operators.similarity import _to_double


def sq8_scale(vec: Column) -> Column:
    """Per-vector symmetric scale; floor of 1e-12 keeps zero vectors
    finite."""
    absmax = F.array_max(F.transform(_to_double(vec), F.abs))
    return F.greatest(absmax, F.lit(1e-12)) / F.lit(127.0)


def sq8_codes(vec: Column, scale: Column) -> Column:
    """int8 code array: round(v/scale), in [-127, 127]."""
    return F.transform(
        _to_double(vec), lambda x: F.round(x / scale).cast("int")
    )


def sq8_reconstruct(codes: Column, scale: Column) -> Column:
    return F.transform(codes, lambda c: c.cast("double") * scale)


def quantize(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Add ``sq_scale`` and ``sq_codes`` columns (narrow map)."""
    scale = sq8_scale(F.col(vec_col))
    return df.withColumn("sq_scale", scale).withColumn(
        "sq_codes", sq8_codes(F.col(vec_col), F.col("sq_scale"))
    )


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def reconstruction_report(
    df: DataFrame, vec_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """Per-label quantization quality: n, mean L2 error, mean cosine."""
    q = quantize(df, vec_col)
    v = _to_double(F.col(vec_col))
    r = sq8_reconstruct(F.col("sq_codes"), F.col("sq_scale"))
    err = F.sqrt(
        F.aggregate(
            F.zip_with(v, r, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, d: acc + d,
        )
    )
    # both norms floored: a zero vector yields cos≈0 instead of an ANSI
    # divide-by-zero (Spark 4 defaults to ansi.enabled=true)
    cos = _dot(v, r) / (
        F.sqrt(F.greatest(_dot(v, v), F.lit(1e-24)))
        * F.sqrt(F.greatest(_dot(r, r), F.lit(1e-24)))
    )
    return (
        q.select(label_col, err.alias("l2_err"), cos.alias("cos"))
        .groupBy(label_col)
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("l2_err"), 4).alias("avg_l2_err"),
            F.round(F.avg("cos"), 4).alias("avg_cosine"),
        )
    )
