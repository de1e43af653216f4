"""Commit protocols for streaming collectors (operators/atomic.py).

The rename variant's contract is pinned in test_bloom.py; this file pins
the OBJECT-STORE variant (commit_batch_dir_marker): same
whole-batches-or-nothing semantics on a filesystem with NO atomic rename
— replay skip, racer loss, torn-attempt invisibility, and end-to-end
equality with the rename protocol through the bloom collector.
"""

from __future__ import annotations

import os

import pytest

from paas_auditor_spark.operators.atomic import (
    commit_batch_dir,
    commit_batch_dir_marker,
    committed_batch_dirs,
)


def _write_file(data_dir, name="part-0", content="x"):
    os.makedirs(data_dir)
    with open(os.path.join(data_dir, name), "w") as fh:
        fh.write(content)


def test_marker_commit_replay_and_visibility(tmp_path):
    path = str(tmp_path)
    assert commit_batch_dir_marker(path, 0, _write_file) is True
    dirs = committed_batch_dirs(path)
    assert len(dirs) == 1 and os.path.isfile(os.path.join(dirs[0], "part-0"))

    # replay: marker exists → write NOT called, nothing changes
    calls: list[str] = []
    assert commit_batch_dir_marker(path, 0, calls.append) is False
    assert calls == []
    assert committed_batch_dirs(path) == dirs


def test_marker_torn_attempt_is_invisible(tmp_path):
    path = str(tmp_path)

    def boom(data_dir):
        _write_file(data_dir)  # half-written batch ...
        raise RuntimeError("executor lost")  # ... then the writer dies

    with pytest.raises(RuntimeError):
        commit_batch_dir_marker(path, 0, boom)
    assert committed_batch_dirs(path) == []  # no marker → invisible
    # the retry commits cleanly into the same batch id
    assert commit_batch_dir_marker(path, 0, _write_file) is True
    assert len(committed_batch_dirs(path)) == 1


def test_marker_racer_loses_quietly(tmp_path):
    path = str(tmp_path)

    def write_then_racer_commits(data_dir):
        _write_file(data_dir, content="loser")
        # a concurrent driver publishes the identical batch mid-write
        commit_batch_dir_marker(path, 0, _write_file)

    assert commit_batch_dir_marker(path, 0, write_then_racer_commits) is False
    dirs = committed_batch_dirs(path)
    assert len(dirs) == 1
    assert open(os.path.join(dirs[0], "part-0")).read() == "x"  # winner's


def test_empty_marker_treated_as_not_yet_visible(tmp_path):
    path = str(tmp_path)
    os.makedirs(tmp_path / "batch-0")
    open(tmp_path / "batch-0" / "_COMMITTED", "w").close()  # content gap
    assert committed_batch_dirs(path) == []


def test_marker_protocol_survives_broken_rename(monkeypatch, tmp_path):
    """The point of the variant: on a filesystem where rename is not
    available/atomic (object stores), the rename protocol fails loudly
    and the marker protocol commits fine — no rename anywhere in it."""

    def no_rename(src, dst):
        raise OSError(95, "Operation not supported")

    monkeypatch.setattr(os, "rename", no_rename)
    with pytest.raises(OSError, match="not supported"):
        commit_batch_dir(str(tmp_path / "rn"), 0, _write_file)
    assert commit_batch_dir_marker(str(tmp_path / "mk"), 0, _write_file)
    assert len(committed_batch_dirs(str(tmp_path / "mk"))) == 1


def test_bloom_collector_marker_equals_rename(spark, tmp_path):
    """End-to-end through the collectors: two batches + a replay under
    each protocol assemble to the SAME filter blob, and under marker a
    torn pre-commit attempt contributes nothing."""
    from pyspark.sql import functions as F

    from paas_auditor_spark.operators.bloom import (
        bloom_assemble,
        bloom_words_collector,
        bloom_words_read,
    )

    def keys(lo, hi):
        return spark.range(lo, hi).select(
            F.concat(F.lit("key"), F.col("id").cast("string")).alias("k")
        )

    m, k = 1 << 14, 4
    blobs = {}
    for protocol in ("rename", "marker"):
        path = str(tmp_path / protocol)
        hook = bloom_words_collector("k", path, m=m, k=k, protocol=protocol)
        hook(keys(0, 300), 0)
        hook(keys(200, 500), 1)
        hook(keys(999, 9999), 1)  # replayed id: must be a no-op
        words = bloom_words_read(spark, path, protocol=protocol)
        blobs[protocol] = bytes(
            bloom_assemble(words).collect()[0]["bloom"]
        )
    assert blobs["marker"] == blobs["rename"]
