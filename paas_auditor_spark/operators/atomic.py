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

Filesystem contract: ``commit_batch_dir`` needs a filesystem the DRIVER
can atomically os.rename on (local disk, NFS, HDFS FileContext) — which
is where these collectors' parquet writes land in local/test
deployments.  ``commit_batch_dir_marker`` is the OBJECT-STORE variant
(S3/GCS, where "rename" is a non-atomic copy+delete): data lands under
a uniquely-named attempt prefix inside the batch directory, and a
single exclusive-create of a ``_COMMITTED`` marker naming the winning
attempt publishes it — the local exclusive-create maps 1:1 to a
conditional PUT (``If-None-Match: *``), the primitive S3 and GCS DO
guarantee atomic.  Readers (``committed_batch_dirs``) consume only
marker-named attempt directories, so torn attempts (crash before
marker) and racing losers are invisible garbage, never torn reads.
The whole-batches-or-nothing contract is identical across both
variants; only the publish primitive changes.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Callable

__all__ = [
    "commit_batch_dir",
    "commit_batch_dir_marker",
    "committed_batch_dirs",
]

_MARKER = "_COMMITTED"


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


def commit_batch_dir_marker(
    path: str, batch_id: int, write: Callable[[str], None]
) -> bool:
    """``commit_batch_dir`` for filesystems WITHOUT atomic rename
    (object stores).  ``write(data_path)`` materializes the batch into
    ``path/batch-<id>/attempt-<unique>/``; publishing is ONE exclusive
    create of ``batch-<id>/_COMMITTED`` whose content names the winning
    attempt (locally ``O_CREAT|O_EXCL``; on S3/GCS the same call is a
    conditional PUT of the marker object).  Same return/raise contract
    as commit_batch_dir: True = this call committed; False = replay or
    racer won (our attempt is deleted best-effort — on a real object
    store a lifecycle rule reaps unmarked attempt prefixes); any
    genuine write/publish failure raises, and the failed attempt stays
    invisible because no marker names it.

    One read-side subtlety the local emulation adds: the marker's
    content lands a syscall after its creation, so a reader polling at
    exactly the wrong instant can glimpse an EMPTY marker —
    ``committed_batch_dirs`` treats that as not-yet-visible and picks
    the batch up on its next poll (a conditional PUT carries content
    atomically, so the gap does not exist on a real object store)."""
    final = os.path.join(path, f"batch-{batch_id}")
    marker = os.path.join(final, _MARKER)
    if os.path.exists(marker):
        return False  # replayed batch: already committed
    attempt = f"attempt-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    data = os.path.join(final, attempt)
    os.makedirs(final, exist_ok=True)
    try:
        write(data)
        try:
            fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            shutil.rmtree(data, ignore_errors=True)
            return False  # racer committed the identical batch
        with os.fdopen(fd, "w") as fh:
            fh.write(attempt + "\n")
        return True
    except BaseException:
        shutil.rmtree(data, ignore_errors=True)
        raise


def committed_batch_dirs(path: str) -> list[str]:
    """Data directories of every PUBLISHED batch under ``path`` —
    the read half of ``commit_batch_dir_marker``: only attempts named
    by a non-empty ``_COMMITTED`` marker are visible; unmarked attempts
    (torn writes, racing losers) and empty markers (the local
    creation/content gap) are skipped.  Sorted by batch id for
    deterministic fold order."""
    if not os.path.isdir(path):
        return []
    out: list[tuple[int, str]] = []
    for d in os.listdir(path):
        if not d.startswith("batch-"):
            continue
        try:
            attempt = (
                open(os.path.join(path, d, _MARKER)).read().strip()
            )
        except OSError:
            continue  # no marker: batch not committed
        if attempt:
            out.append((int(d.split("-", 1)[1]), os.path.join(path, d, attempt)))
    return [p for _, p in sorted(out)]
