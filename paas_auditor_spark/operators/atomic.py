"""Whole-batch-or-nothing directory commits for streaming collectors.

One implementation of the write-to-hidden-tmp + atomic-rename protocol
shared by every foreachBatch collector that appends per-batch mergeable
relations (`bloom.bloom_words_collector`, `quantiles.hist_collector`) —
a single place to hold the three load-bearing details:

- the tmp directory is dot-prefixed (invisible to Spark readers) AND
  pid-suffixed, so two writers racing on the same batch id (a zombie
  driver plus its restarted replacement) each write a PRIVATE tmp —
  neither can overwrite the other mid-write and rename a torn file set;
- a failed rename is only swallowed when the final directory EXISTS
  (a racer committed the identical batch); any other failure re-raises,
  because silently dropping a batch is data loss — for a Bloom gate it
  is silent false negatives, for a count sketch it is lost mass;
- a replayed batch (at-least-once delivery) finds its committed
  directory and writes nothing, which is the CORRECTNESS mechanism for
  additive relations (counts would double-add; bits merely re-OR).

Filesystem contract: ``path`` must be a filesystem the DRIVER can
os.rename on (local disk, NFS) — which is where these collectors'
parquet writes land in local/test deployments.  On HDFS or an object
store, swap this helper for the storage-native commit (FileContext
rename / a _SUCCESS-marker-gated read): the whole-batches-or-nothing
contract is the same, only the rename primitive changes.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

__all__ = ["commit_batch_dir"]


def commit_batch_dir(
    path: str, batch_id: int, write: Callable[[str], None]
) -> bool:
    """Commit one micro-batch directory under ``path`` as
    ``batch-<id>``: ``write(tmp_path)`` materializes the batch into a
    private hidden tmp dir, then one atomic rename publishes it.
    Returns True if this call committed, False if the batch was already
    committed (replay, or a racer won).  Raises on any genuine commit
    failure — a batch is either fully visible or loudly absent, never
    silently dropped."""
    final = os.path.join(path, f"batch-{batch_id}")
    if os.path.isdir(final):
        return False  # replayed batch: already committed
    tmp = os.path.join(path, f".batch-{batch_id}.tmp{os.getpid()}")
    try:
        write(tmp)
        try:
            os.rename(tmp, final)
        except OSError:
            if not os.path.isdir(final):
                raise  # not a race: surface the failure, keep the batch
            return False  # racer committed the identical batch
        return True
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
