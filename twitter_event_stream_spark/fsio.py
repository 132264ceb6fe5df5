"""Hadoop-FileSystem helpers for persisted-index maintenance (X119).

The two persisted indexes (X114 IVF cells, X115 SimHash band rows) grow by
parquet APPENDS — one-plus files per ingest batch — so their maintenance
paths (compaction, file-count telemetry) need filesystem operations that
land on whatever FS the parquet lives on (local, HDFS, S3A), not POSIX
calls against a path string. Same JVM FileSystem API the X117 manifest
writer uses (streaming/pipelines._write_fs_manifest).
"""

from __future__ import annotations

import uuid


def _fs(spark, path: str):
    """(FileSystem, Path-class) pair for ``path``'s filesystem."""
    hpath = spark._jvm.org.apache.hadoop.fs.Path
    fs = hpath(path).getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def data_file_count(spark, path: str) -> int:
    """Number of DATA files under ``path`` (recursive; ``_``/``.``-prefixed
    names — success markers, manifests, temporaries — excluded). This is
    the observability number behind the compaction trigger: an
    append-grown index's probe cost drifts with FILE count (listing,
    parquet footer reads, task scheduling), not byte count, so the
    maintenance decision watches files, not rows."""
    fs, hpath = _fs(spark, path)
    it = fs.listFiles(hpath(path), True)
    n = 0
    while it.hasNext():
        name = it.next().getPath().getName()
        if not name.startswith(("_", ".")):
            n += 1
    return n


def atomic_swap_dir(spark, live: str, fresh: str) -> None:
    """Replace directory ``live`` with ``fresh`` via two renames: move the
    live dir aside, move the fresh dir into its place, delete the old.
    Rename is atomic on HDFS and local filesystems, so concurrent readers
    resolve either the old file set or the new one — never a mix of both
    (a reader that already listed the old files keeps reading them; POSIX
    and HDFS keep renamed-away files readable through open handles). On
    S3A a "rename" is copy+delete and NOT atomic — run the swap under the
    caller's maintenance lock there, or point ``fresh`` at a versioned
    path and flip a pointer instead. If the second rename fails the old
    dir is restored, so a crashed swap never leaves the index missing."""
    fs, hpath = _fs(spark, live)
    old = hpath(f"{live}.old-{uuid.uuid4().hex}")
    if not fs.rename(hpath(live), old):
        raise IOError(f"atomic_swap_dir: could not move {live} aside")
    if not fs.rename(hpath(fresh), hpath(live)):
        fs.rename(old, hpath(live))
        raise IOError(
            f"atomic_swap_dir: could not move {fresh} into place "
            f"(previous contents restored)"
        )
    fs.delete(old, True)


def manifested_batch_ids(spark, out_dir: str) -> list[int]:
    """Sorted ids of batches with a COMMITTED manifest under
    ``out_dir/_manifests`` (the X117 commit protocol: the manifest is the
    batch's last write, so its presence certifies the data landed). Shared
    by every manifested reader — corpus sink, reject trail, vector-ingest
    spill — so the commit rule cannot drift between them."""
    fs, hpath = _fs(spark, out_dir)
    mdir = hpath(f"{out_dir}/_manifests")
    ids: list[int] = []
    if fs.exists(mdir):
        for st in fs.listStatus(mdir):
            name = st.getPath().getName()
            if name.startswith("batch-") and name.endswith(".json"):
                ids.append(int(name[len("batch-"):-len(".json")]))
    return sorted(ids)
