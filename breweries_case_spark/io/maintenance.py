"""Table maintenance: small-file compaction for partitioned parquet
(production hygiene the reference leaves to Iceberg's rewrite_data_files;
this is the same operation expressed against plain partitioned parquet).

Why it exists: streaming sinks and frequent small batch writes leave
partitions with many tiny files; at 100 TB the file-listing and per-file
open costs dominate scans long before data volume does. Compaction
rewrites ONE partition's files into a target count, touching nothing
else.

Atomicity: on a local filesystem the swap is two renames (staging dir →
partition dir) — briefly non-atomic. On object stores / production, use
a transactional table format (Iceberg `rewrite_data_files`, Delta
`OPTIMIZE`) where the swap is a metadata commit; the read-repartition-
write plan below is identical there, only the commit differs."""

from __future__ import annotations

import glob
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def partition_files(root: str, partition_col: str, value) -> list[str]:
    """Data files currently serving one partition."""
    return sorted(
        glob.glob(os.path.join(root, f"{partition_col}={value}", "part-*"))
    )


def compact_partition(
    spark: SparkSession,
    root: str,
    partition_col: str,
    value,
    target_files: int = 1,
) -> int:
    """Rewrite one partition of a partitioned-parquet table into
    ``target_files`` files. Returns the resulting file count.

    Reads ONLY the partition directory (no filter over the full table —
    pruning by construction), repartitions, writes to a staging dir,
    then swaps directories. Row content is byte-identical; only file
    layout changes."""
    pdir = os.path.join(root, f"{partition_col}={value}")
    if not os.path.isdir(pdir):
        raise FileNotFoundError(pdir)
    staged = os.path.join(root, f"_compacting_{uuid.uuid4().hex}")
    # partition-value column is constant within pdir and lives in the
    # directory name, not the files — read/write the files as-is
    (
        spark.read.parquet(pdir)
        .repartition(target_files)
        .write.mode("overwrite")
        .parquet(staged)
    )
    old = os.path.join(root, f"_compacted_old_{uuid.uuid4().hex}")
    os.rename(pdir, old)
    os.rename(staged, pdir)
    shutil.rmtree(old, ignore_errors=True)
    # drop writer bookkeeping files so the dir holds data files only
    for extra in glob.glob(os.path.join(pdir, "_SUCCESS*")):
        os.remove(extra)
    return len(partition_files(root, partition_col, value))


def compact_small_partitions(
    spark: SparkSession,
    root: str,
    partition_col: str,
    max_files: int = 4,
    target_files: int = 1,
) -> dict[str, int]:
    """Compact every partition whose file count exceeds ``max_files``.
    Returns {partition_value: new_file_count} for the touched ones.
    Partitions are processed independently — at scale, parallelize across
    partitions (each compaction is its own small job)."""
    out: dict[str, int] = {}
    prefix = f"{partition_col}="
    for entry in sorted(os.listdir(root)):
        if not entry.startswith(prefix):
            continue
        value = entry[len(prefix):]
        if len(partition_files(root, partition_col, value)) > max_files:
            out[value] = compact_partition(
                spark, root, partition_col, value, target_files
            )
    return out
