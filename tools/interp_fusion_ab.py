"""A/B: lm_perplexity_interp marginal fusion via grouping sets
(VERDICT r11 #5 / r12 candidate).  Builds the CURRENT operator and a
FUSED variant (c3ctx/b23/total from ONE grouping-sets pass over c3),
checks value equality row-for-row, then times both warm best-of-3.

Run on a quiet box: python tools/interp_fusion_ab.py
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def fused_interp(docs_df, spine, lambdas=(0.5, 0.3, 0.2)):
    from paas_auditor_spark.functions.text import tokens
    from paas_auditor_spark.operators.corpus import _tri_structs

    l3, l2, l1 = lambdas
    id_col = "doc_id"
    toked = docs_df.select(
        F.col(id_col), tokens(F.lower(F.col("text"))).alias("toks")
    ).localCheckpoint(eager=False)
    occ = (
        toked.select(id_col, F.explode(_tri_structs(F.col("toks"))).alias("g"))
        .groupBy(
            id_col,
            F.col("g.w1").alias("w1"),
            F.col("g.w2").alias("w2"),
            F.col("g.w3").alias("w3"),
        )
        .agg(F.count(F.lit(1)).alias("m"))
        .localCheckpoint(eager=False)
    )
    c3 = (
        occ.groupBy("w1", "w2", "w3")
        .agg(F.sum("m").alias("c3"))
        .localCheckpoint(eager=False)
    )
    # ONE grouping-sets pass over c3 for c3ctx / b23 / total
    gs = (
        c3.groupingSets(
            [["w1", "w2"], ["w2", "w3"], []], "w1", "w2", "w3"
        )
        .agg(F.sum("c3").alias("c"), F.grouping_id().alias("gid"))
        .localCheckpoint(eager=False)
    )
    # gid bit order: (w1,w2,w3) -> w1 is MSB. sets: (w1,w2)->gid 0b001=1;
    # (w2,w3)->gid 0b100=4; ()->gid 0b111=7
    c3ctx = gs.filter(F.col("gid") == 1).select(
        "w1", "w2", F.col("c").alias("c3ctx")
    )
    b23 = gs.filter(F.col("gid") == 4).select(
        "w2", "w3", F.col("c").alias("b23")
    )
    total = gs.filter(F.col("gid") == 7).select(
        F.col("c").alias("n_total")
    )
    b2 = b23.groupBy("w2").agg(F.sum("b23").alias("b2"))
    u3 = b23.groupBy("w3").agg(F.sum("b23").alias("u3"))
    vocab = (
        toked.select(F.explode("toks").alias("w"))
        .filter(F.length("w") >= 1)
        .agg(F.countDistinct("w").alias("v"))
    )
    p = (
        F.lit(l3) * (F.col("c3") + 1) / (F.col("c3ctx") + F.col("v"))
        + F.lit(l2) * (F.col("b23") + 1) / (F.col("b2") + F.col("v"))
        + F.lit(l1) * (F.col("u3") + 1) / (F.col("n_total") + F.col("v"))
    )
    b23e = b23.join(F.broadcast(b2), on="w2").join(F.broadcast(u3), on="w3")
    enriched = (
        c3.join(c3ctx, on=["w1", "w2"])
        .join(b23e, on=["w2", "w3"])
        .crossJoin(vocab)
        .crossJoin(total)
    )
    scored = occ.join(enriched, on=["w1", "w2", "w3"]).select(
        id_col, "m", (-F.col("m") * F.log(p)).alias("nll")
    )
    per_doc = scored.groupBy(id_col).agg(
        F.sum("m").alias("n_trigrams"),
        (F.sum("nll") / F.sum("m")).alias("raw_nll"),
    )
    return (
        spine.select(F.col(id_col))
        .join(per_doc, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.col("n_trigrams"), F.lit(0)).alias("n_trigrams"),
            F.round(F.col("raw_nll"), 4).alias("avg_nll"),
            F.round(F.exp(F.col("raw_nll")), 4).alias("ppl"),
        )
        .orderBy(id_col)
    )


def main():
    from paas_auditor_spark.queries import REGISTRY, _t, _th
    from paas_auditor_spark.session import get_spark

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="interp-fusion-ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    sc = spark.sparkContext

    def cur():
        return REGISTRY["lm_perplexity_interp"].fn(spark, sf)

    def fus():
        docs = _th(spark, sf, "documents")
        spine = _t(spark, sf, "documents").select("doc_id")
        return fused_interp(docs, spine)

    # value equality first
    a = cur().toPandas()
    b = fus().toPandas()
    import pandas as pd

    pd.testing.assert_frame_equal(a, b, check_dtype=False, atol=0, rtol=0)
    print(f"EQUAL rows={len(a)}")

    for name, fn in [("current", cur), ("fused", fus)]:
        # warm
        fn().write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(3):
            sc.setJobGroup(name, name)
            j0 = len(sc.statusTracker().getJobIdsForGroup(name))
            t0 = time.perf_counter()
            df = fn()
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            jobs = len(sc.statusTracker().getJobIdsForGroup(name)) - j0
            runs.append((t2 - t0, t1 - t0, t2 - t1, jobs))
            df = None
            gc.collect()
        best = min(runs, key=lambda r: r[0])
        print(
            f"{name}: best total {best[0]:.3f} (build {best[1]:.3f} "
            f"exec {best[2]:.3f} jobs {best[3]}) all={[round(r[0],3) for r in runs]}"
        )


if __name__ == "__main__":
    main()
