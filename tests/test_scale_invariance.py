"""Scale-invariance of physical plans (r6 verdict task #2, the measured
half of the 100 TB story): replicating the corpus N× must not change any
plan's operator multiset — partition counts and task sizes grow, plan
SHAPE does not (no new Exchanges, broadcasts intact, no single-partition
stages appearing).

The full sf0.1→sf1 (10×) rehearsal with wall-times lives in
tools/scale_rehearsal.py and its SURVEY §6 table; this test pins the
same property in CI at sf0.001→×4, using the same slice generator and
plan fingerprint, so a refactor that silently makes a plan data-size-
dependent fails here long before a big-data run."""

from __future__ import annotations

import importlib.util
import os

import pytest

_TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_TOOLS, f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# Queries chosen to span the operator families whose 100 TB posture the
# verdict graded (ship path, TPC-H agg+joins, decontamination, chunk
# dedup, retrieval, ANN-LSH, the r7 distributed rank) AND whose plans
# contain no legitimately data-sized broadcast candidate (lm_perplexity's
# final doc-sized join flips broadcast→shuffle with size, correctly — see
# the SURVEY §6 footnote — so LM queries are pinned by the rehearsal
# table instead).
QUERIES = [
    "unshipped_events", "pricing_summary", "bloom_decontaminate",
    "cdc_near_dup", "bm25_search", "bm25_persisted",
    "embedding_near_dup_lsh", "activity_gini",
    # r8 flagships (both measured plan-invariant at 10× AND 100×);
    # the adaptive-parameter queries (knn_ivf*, semantic_dedup) are
    # deliberately NOT pinned — their centroid counts change with
    # corpus size by design
    "lm_perplexity_persisted", "audio_windows",
]


@pytest.fixture(scope="module")
def big_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("scale") / "sf4x")
    _load("make_scale_slice").make_slice(
        spark, "/root/testdata/sf0.001", out, factor=4
    )
    return out


@pytest.mark.parametrize("qname", QUERIES)
def test_plan_shape_invariant_under_replication(spark, big_dir, qname):
    from paas_auditor_spark.queries import REGISTRY

    plan_shape = _load("scale_rehearsal").plan_shape
    fn = REGISTRY[qname].fn
    small = plan_shape(fn(spark, "/root/testdata/sf0.001"))
    big = plan_shape(fn(spark, big_dir))
    diff = {
        k: (small.get(k, 0), big.get(k, 0))
        for k in sorted(set(small) | set(big))
        if small.get(k, 0) != big.get(k, 0)
    }
    assert not diff, f"{qname} plan changed with data size: {diff}"
