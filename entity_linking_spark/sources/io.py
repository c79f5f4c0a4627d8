"""Checkpointed stage IO: resume-from-checkpoint with lineage metrics.

The reference pickles every stage's output and skips recompute when the
file exists (process_wiki_extractor_output.py:33-35, enrich_data.py:27-29
— SURVEY §2.1 S7). Here each stage writes a columnar snapshot plus a
_STAGE.json sidecar carrying row counts and per-partition lineage, and a
rerun skips any stage whose snapshot is complete. Kill-and-rerun
therefore resumes mid-pipeline — the north-rule resumability requirement.

The snapshot FORMAT is pluggable via SPARK_GRAFT_TABLE_FORMAT: parquet
(default) and orc are exercised in this container's test suite; on a
real cluster with iceberg-spark-runtime on the classpath and a catalog
configured, "iceberg" routes the same save/load path through Iceberg's
DataSource (path-based Hadoop tables), which is the north-star's
"every stage checkpointed to Iceberg" contract — no Iceberg runtime jar
ships in this sandbox, so that branch cannot be exercised here and the
tested evidence is the format seam itself (two real formats + the
format-agnostic lineage fallback).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

_META = "_STAGE.json"


def stage_format() -> str:
    """Stage snapshot format for NEW writes (read per call so harnesses
    can switch). Reads never trust this alone: write_stage records the
    format in the sidecar and read_stage prefers the recorded value, so
    resuming a workdir under a different SPARK_GRAFT_TABLE_FORMAT reads
    existing snapshots with the DataSource that actually wrote them."""
    return os.environ.get("SPARK_GRAFT_TABLE_FORMAT", "parquet")


def stage_path(root: str, name: str) -> str:
    return os.path.join(root, name)


# Scheme-qualified workdirs (s3://, hdfs://) route every sidecar
# operation through pyarrow.fs so resume/lineage work end-to-end on a
# remote filesystem, not just the parquet-footer reads: the sidecar
# write, the skip-if-exists probe, and the meta read all share the
# branch below. (Spark's own writer already handles remote stage data
# via its Hadoop filesystems.)


def _is_remote(path: str) -> bool:
    return "://" in path


def _sidecar_write(path: str, meta: dict) -> None:
    data = json.dumps(meta, indent=1)
    if _is_remote(path):
        from pyarrow import fs as pafs

        filesystem, p = pafs.FileSystem.from_uri(path)
        with filesystem.open_output_stream(p) as f:
            f.write(data.encode())
    else:
        with open(path, "w") as f:
            f.write(data)


def _sidecar_read(path: str) -> dict:
    if _is_remote(path):
        from pyarrow import fs as pafs

        filesystem, p = pafs.FileSystem.from_uri(path)
        with filesystem.open_input_file(p) as f:
            return json.loads(f.read().decode())
    with open(path) as f:
        return json.load(f)


def _exists(path: str) -> bool:
    if _is_remote(path):
        from pyarrow import fs as pafs

        filesystem, p = pafs.FileSystem.from_uri(path)
        return filesystem.get_file_info(p).type != pafs.FileType.NotFound
    return os.path.exists(path)


def stage_complete(root: str, name: str) -> bool:
    return _exists(os.path.join(stage_path(root, name), _META))


def _parquet_lineage(path: str) -> dict[str, int]:
    """Per-file row counts from parquet FOOTERS — metadata-only, no scan.

    A footer read is O(files), not O(rows): at 3k docs it replaced a full
    Spark read-back job per stage (~0.5-1 s of pure fixed cost x 6
    stages), and at 100 TB it reads a few KB per file instead of
    re-scanning the stage output. Remote stage paths (s3://, hdfs://)
    go through pyarrow.fs.FileSystem.from_uri — same footer-only reads,
    remote listing instead of os.walk; if the footer read fails (e.g.
    missing credentials) we fall back to a Spark count so the sidecar is
    never silently wrong.
    """
    import pyarrow.parquet as pq

    out: dict[str, int] = {}
    if "://" in path:
        from pyarrow import fs as pafs

        filesystem, fs_path = pafs.FileSystem.from_uri(path)
        infos = filesystem.get_file_info(pafs.FileSelector(fs_path, recursive=True))
        for info in sorted(infos, key=lambda i: i.path):
            if info.is_file and info.path.endswith(".parquet"):
                rel = os.path.relpath(info.path, fs_path)
                with filesystem.open_input_file(info.path) as f:
                    out[rel] = pq.ParquetFile(f).metadata.num_rows
    else:
        # walk: partitionBy layouts nest files under key=value/ dirs
        for dirpath, _dirs, files in sorted(os.walk(path)):
            for entry in sorted(files):
                if entry.endswith(".parquet"):
                    rel = os.path.relpath(os.path.join(dirpath, entry), path)
                    out[rel] = pq.ParquetFile(
                        os.path.join(dirpath, entry)
                    ).metadata.num_rows
    if not out:
        raise FileNotFoundError(f"no parquet files under {path}")
    return out


def write_stage(df: DataFrame, root: str, name: str, partition_by: list[str] | None = None) -> dict:
    """Materialize a stage snapshot + lineage metrics sidecar."""
    path = stage_path(root, name)
    t0 = time.time()
    fmt = stage_format()
    writer = df.write.mode("overwrite").format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
    spark = df.sparkSession
    try:
        per_partition = _parquet_lineage(path)
    except Exception:  # noqa: BLE001 — non-parquet format, or remote FS
        # format-agnostic fallback: one Spark read-back job (orc/iceberg
        # snapshots, or parquet on a filesystem pyarrow lacks creds for)
        per_partition = {
            str(r["partition"]): r["count"]
            for r in spark.read.format(fmt)
            .load(path)
            .groupBy(F.spark_partition_id().alias("partition"))
            .count()
            .collect()
        }
    meta = {
        "stage": name,
        "format": fmt,
        "rows": sum(per_partition.values()),
        "seconds": round(time.time() - t0, 3),
        "partitions": per_partition,
        "schema": df.schema.simpleString(),
    }
    _sidecar_write(os.path.join(path, _META), meta)
    return meta


def read_stage(spark: SparkSession, root: str, name: str) -> DataFrame:
    # prefer the format recorded at write time: a workdir written under
    # one SPARK_GRAFT_TABLE_FORMAT must resume correctly even if the
    # env var has since changed (sidecars from before the format seam
    # carry no "format" key and fall back to the current setting)
    fmt = stage_format()
    try:
        fmt = stage_meta(root, name).get("format", fmt)
    except (OSError, json.JSONDecodeError):
        pass
    return spark.read.format(fmt).load(stage_path(root, name))


def stage_meta(root: str, name: str) -> dict:
    """The _STAGE.json sidecar (rows / seconds / per-partition lineage) —
    lets callers answer "how many rows did stage X emit" without a Spark
    job over the snapshot."""
    return _sidecar_read(os.path.join(stage_path(root, name), _META))


def run_stage(
    spark: SparkSession,
    root: str,
    name: str,
    build: Callable[[], DataFrame],
    force: bool = False,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Skip-if-exists stage runner (the resume-from-checkpoint primitive)."""
    verbose = os.environ.get("EL_VERBOSE") == "1"
    t0 = time.time()
    if not force and stage_complete(root, name):
        out = read_stage(spark, root, name)
        if verbose:
            print(f"[stage {name}] skipped (checkpoint), {time.time()-t0:.2f}s")
        return out
    df = build()
    if verbose:
        print(f"[stage {name}] plan built at +{time.time()-t0:.2f}s", flush=True)
    write_stage(df, root, name, partition_by)
    if verbose:
        print(f"[stage {name}] written at +{time.time()-t0:.2f}s", flush=True)
    return read_stage(spark, root, name)
