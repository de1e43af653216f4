"""Misra-Gries guarantee tests: exactness when capacity covers the
vocabulary, and the frequency/lower-bound guarantees when it does not."""

from __future__ import annotations

import random
from collections import Counter

from paas_auditor_spark.operators.heavyhitters import (
    heavy_hitters,
    misra_gries_summary,
)


def _items_df(spark, items, partitions=4):
    return spark.createDataFrame(
        [(x,) for x in items], ["item"]
    ).repartition(partitions)


def test_exact_when_capacity_covers_vocab(spark):
    items = ["a"] * 50 + ["b"] * 30 + ["c"] * 19 + ["d"]
    random.Random(7).shuffle(items)
    got = {
        r["item"]: r["cnt_lb"]
        for r in misra_gries_summary(_items_df(spark, items), "item", 100).collect()
    }
    assert got == {"a": 50, "b": 30, "c": 19, "d": 1}


def test_guarantees_under_tight_capacity(spark):
    rng = random.Random(11)
    # 3 heavy items + a long tail of 200 singletons-ish
    items = ["hot1"] * 400 + ["hot2"] * 300 + ["hot3"] * 200
    items += [f"tail{i}" for i in range(200) for _ in range(rng.randint(1, 3))]
    rng.shuffle(items)
    true = Counter(items)
    n = len(items)
    capacity = 50
    df = _items_df(spark, items, partitions=4)
    got = {
        r["item"]: r["cnt_lb"]
        for r in misra_gries_summary(df, "item", capacity).collect()
    }
    # every item with freq > n/capacity per partition-sum bound survives;
    # partition error adds, so the merged bound is n/capacity
    for item, c in true.items():
        if c > n / capacity:
            assert item in got, f"heavy item {item} (freq {c}) dropped"
    # reported counts are lower bounds, short by at most n/capacity
    for item, lb in got.items():
        assert lb <= true[item]
        assert true[item] - lb <= n / capacity

    top = heavy_hitters(df, "item", k=3, capacity=capacity).collect()
    assert [r["item"] for r in top] == ["hot1", "hot2", "hot3"]
