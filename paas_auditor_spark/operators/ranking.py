"""BM25 ranked retrieval over a tokenized document corpus.

Training-data curation pipelines rank documents against a query term set
(quality probes, contamination probes, topical slices).  This is the
batch retrieval shape: tokenize → per-doc term frequencies for the query
terms only → document frequencies → Okapi BM25 with the Lucene idf
variant ``ln(1 + (N - df + 0.5)/(df + 0.5))``.

Scale posture (100 TB): the token explode is a narrow map; the tf
aggregation shuffles only (doc_id, term) pairs for the |Q| query terms —
a tiny fraction of the corpus — and doc lengths aggregate map-side.  The
df/avgdl aggregates are |Q|-row and 1-row frames joined by broadcast, so
the only full shuffle is the per-doc score combine on doc_id.  No UDFs;
everything stays in whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paas_auditor_spark.functions import text as tx


def bm25_scores(
    docs: DataFrame,
    query_terms: Sequence[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-document BM25 score for ``query_terms``; one row per matching
    document: (id_col, score)."""
    toks = docs.select(
        F.col(id_col),
        F.explode(tx.tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    # materialize doc lengths once (the corpus-sized explode+agg) so the
    # scalar stats and the final score join both reuse it instead of
    # re-exploding the corpus.  N is counted over the DOCS relation, not
    # doclen: explode drops NULL-text documents, and BM25's N (like the
    # oracle's count(*) FROM documents) counts every document in the
    # corpus; avgdl is over documents that HAVE tokens, matching the
    # oracle's doclen CTE.  Two bounded driver actions (a count and a
    # 1-row collect), both scalar.
    doclen = (
        toks.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("dl"))
        .localCheckpoint(eager=False)
    )
    n_docs = docs.count()
    avgdl = float(doclen.agg(F.avg("dl")).collect()[0][0])

    qterms = [t.lower() for t in query_terms]
    qtoks = toks.filter(F.col("term").isin(qterms))
    tf = qtoks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = qtoks.groupBy("term").agg(F.countDistinct(id_col).alias("df"))

    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    # df_ is |Q|-row → broadcast; doclen is corpus-sized → shuffle join on
    # the id (both sides already hash on it from their aggregations)
    per_term = (
        tf.join(F.broadcast(df_), "term")
        .join(doclen, id_col)
        .select(
            id_col,
            (
                idf
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl") / F.lit(avgdl))
                )
            ).alias("term_score"),
        )
    )
    return per_term.groupBy(id_col).agg(
        F.sum("term_score").alias("score")
    )
