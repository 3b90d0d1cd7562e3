"""Per-stage lineage/metrics + idempotent resume.

The reference's delivery guarantees live in HTTP retry + at-least-once
Lambda semantics (/root/reference/src/function.py:136-177,286-306). The
distributed analog (SURVEY.md §4 item 3): task-level retry is Spark's,
commit atomicity is the sink write, and JOB-level resume is this module —
a checkpoint table recording, per stage and sink, row counts and
per-partition lineage, written after each successful sink commit. A
re-run consults the manifest and skips (or verifies) completed sinks, so
a mid-job kill converges to identical per-sink counts.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

# Free-text / unique-id string columns. A parquet dictionary attempt on
# these always overflows its size cap and falls back to plain encoding,
# so the per-row-group dictionary build is pure wasted CPU on the hot
# write path — measured 39% of end-to-end job CPU at 10M turns, with
# byte-identical output (zstd captures the little redundancy a fallback
# dictionary would have; writer A/B in BENCH/BASELINE.md). Categorical
# columns (conv_id, role, sink, log_group, trace_id...) keep dictionary
# encoding: it genuinely shrinks them and feeds dictionary-filter
# pushdown on the read side.
HIGH_CARDINALITY_TEXT_COLS = frozenset({"text", "message", "req_id_raw"})


def parquet_text_options(df: DataFrame) -> dict[str, str]:
    """Per-column writer options (parquet.enable.dictionary#<col>, a
    parquet-java >= 1.12 feature) disabling dictionary encoding for the
    high-cardinality text columns actually present in ``df``."""
    cols = HIGH_CARDINALITY_TEXT_COLS.intersection(
        f.name for f in df.schema.fields
    )
    return {f"parquet.enable.dictionary#{c}": "false" for c in sorted(cols)}


class CheckpointLog:
    """JSON-lines manifest (one file per completed stage) under
    ``<dir>/_checkpoints``. File-per-stage keeps writes atomic at the
    filesystem level (rename-on-write); in the Iceberg deployment this is
    an append to a checkpoint table, one atomic snapshot per stage."""

    def __init__(self, out_dir: str, job_id: str | None = None):
        self.dir = os.path.join(out_dir, "_checkpoints")
        os.makedirs(self.dir, exist_ok=True)
        self.job_id = job_id or uuid.uuid4().hex[:12]

    def _path(self, stage: str) -> str:
        return os.path.join(self.dir, f"{stage}.json")

    def is_done(self, stage: str) -> bool:
        return os.path.exists(self._path(stage))

    def record(self, stage: str, payload: dict) -> None:
        tmp = self._path(stage) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {"job_id": self.job_id, "stage": stage, "wall_time": time.time(), **payload},
                f,
                sort_keys=True,
            )
        os.replace(tmp, self._path(stage))

    def read(self, stage: str) -> dict | None:
        if not self.is_done(stage):
            return None
        with open(self._path(stage)) as f:
            return json.load(f)

    def clear(self) -> None:
        for f in os.listdir(self.dir):
            if f.endswith(".json"):
                os.remove(os.path.join(self.dir, f))


def partition_lineage(df: DataFrame) -> list[dict]:
    """Per-partition row counts — the lineage record each stage emits."""
    rows = (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count(F.lit(1)).alias("rows"))
        .collect()
    )
    return [{"partition_id": r["partition_id"], "rows": r["rows"]} for r in rows]


def file_lineage(path: str) -> list[dict]:
    """Per-output-file row counts straight from parquet footers (pyarrow,
    no Spark job): the cheap physical form of per-partition lineage —
    each task's output file is one entry. On Iceberg this is the
    manifest-file content the snapshot already carries."""
    import pyarrow.parquet as pq

    out = []
    for root, _dirs, files in os.walk(path):
        for fname in sorted(files):
            if fname.endswith(".parquet"):
                fp = os.path.join(root, fname)
                out.append(
                    {
                        "file": os.path.relpath(fp, path),
                        "rows": pq.ParquetFile(fp).metadata.num_rows,
                    }
                )
    return out


# --- Iceberg catalog routing (VERDICT r3 #7) -------------------------------
# Sinks write to Iceberg tables when (a) a SparkCatalog is configured AND
# (b) the Iceberg runtime jar is actually on the classpath; parquet paths
# otherwise (this sandbox — no jar — always takes the parquet branch;
# SURVEY.md §7 licenses the fallback). Detection is split so the branch
# choice itself is testable without the jar.

ICEBERG_NAMESPACE = os.environ.get("SPARK_GRAFT_ICEBERG_NAMESPACE", "logs")


def configured_catalogs(spark) -> list[str]:
    """Names of catalogs declared via ``spark.sql.catalog.<name>`` conf."""
    names = set()
    for k, _v in spark.sparkContext.getConf().getAll():
        parts = k.split(".")
        # spark.sql.catalog.<name> exactly (sub-keys like .type have 5+)
        if len(parts) == 4 and parts[:3] == ["spark", "sql", "catalog"]:
            names.add(parts[3])
    return sorted(names)


def iceberg_available(spark) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def iceberg_catalog(spark) -> str | None:
    """The catalog name sinks should write through, or None for parquet.

    A catalog conf WITHOUT the runtime jar falls back to parquet (loud in
    the manifest via ``sink_format``) instead of failing every write."""
    cats = configured_catalogs(spark)
    if cats and iceberg_available(spark):
        return cats[0]
    return None


def sink_format(spark) -> dict:
    """The branch decision, recorded verbatim into stage manifests."""
    cats = configured_catalogs(spark)
    cat = iceberg_catalog(spark)
    return {
        "format": "iceberg" if cat else "parquet",
        "catalog": cat,
        "catalogs_configured": cats,
        "iceberg_runtime": iceberg_available(spark),
    }


def _write_observed(observed: DataFrame, path: str, stage: str, order_cols) -> dict:
    """Route one sorted sink write: Iceberg ``writeTo`` when a catalog is
    usable, parquet path otherwise. Returns the manifest fragment."""
    spark = observed.sparkSession
    fmt = sink_format(spark)
    sorted_df = observed.sortWithinPartitions(*order_cols)
    if fmt["format"] == "iceberg":
        table = f"{fmt['catalog']}.{ICEBERG_NAMESPACE}.{stage}"
        # createOrReplace = one atomic snapshot commit per stage — the
        # Iceberg analog of the parquet overwrite + manifest record
        sorted_df.writeTo(table).using("iceberg").createOrReplace()
        return {**fmt, "table": table}
    sorted_df.write.mode("overwrite").options(
        **parquet_text_options(sorted_df)
    ).parquet(path)
    return {**fmt, "path": path}


def observed_write(
    df: DataFrame,
    path: str,
    log: CheckpointLog,
    stage: str,
    order_cols=("conv_id", "turn_idx"),
    extra: dict | None = None,
) -> int:
    """Write one sink with observe() metrics + checkpoint record.

    Returns the row count. If the stage is already checkpointed, the
    write is skipped and the recorded count returned (idempotent resume).
    ``observe`` rides the write job — no second scan for the count.
    """
    prior = log.read(stage)
    if prior is not None:
        return prior["rows"]
    from pyspark.sql import Observation

    obs = Observation(f"obs_{stage}")
    observed = df.observe(obs, F.count(F.lit(1)).alias("rows"))
    sink_info = _write_observed(observed, path, stage, order_cols)
    rows = obs.get["rows"]
    record = {"rows": rows, **sink_info, **(extra or {})}
    if sink_info["format"] == "parquet":
        lineage = file_lineage(path)
        assert sum(e["rows"] for e in lineage) == rows, "lineage/observe count drift"
        record["lineage"] = lineage
    log.record(stage, record)
    return rows


def observed_write_bucketed(
    df: DataFrame,
    path: str,
    log: CheckpointLog,
    stage: str,
    n_buckets: int = 32,
    n_batches: int = 4,
    order_cols=("conv_id", "turn_idx"),
    fail_after_batches: int | None = None,
) -> int:
    """Stage write with PER-CONV-RANGE resume (finer than stage-level).

    Conversations hash into ``n_buckets`` ranges (crc32(conv_id) %
    n_buckets — content-derived, so deterministic across runs and uniform
    under skew); buckets commit in ``n_batches`` sequential jobs, each
    recording its own checkpoint + per-file lineage. A re-run ANTI-JOINS
    the recorded batches: completed conversation ranges are filtered out
    of the scan (never recomputed, never rewritten), so a mid-stage kill
    loses at most 1/n_batches of the stage instead of all of it. Partition
    overwrite is dynamic, so re-running a half-written batch overwrites
    only its own bucket directories — idempotent. This is the distributed
    analog of the reference's per-invocation at-least-once retry
    (/root/reference/src/function.py:136-177): the unit of redelivery is
    a conversation range, and the manifest is the dedup ledger.

    ``fail_after_batches`` is a test hook: raise after N batch commits to
    simulate a mid-stage kill.
    """
    # Fresh start (no batch checkpoints) into a dir holding a previous
    # run's output: dynamic partition-overwrite only replaces buckets
    # present in the NEW data, so stale buckets from the old run would
    # survive and trip the lineage assert (or leak rows). Truncate first —
    # the Iceberg analog is CREATE OR REPLACE before the first snapshot.
    if not any(log.is_done(f"{stage}.b{k}") for k in range(n_batches)):
        if os.path.isdir(path):
            import shutil

            shutil.rmtree(path)
    bucket = F.crc32(F.col("conv_id")) % n_buckets
    staged = df.withColumn("conv_bucket", bucket.cast("int"))
    total = 0
    done_batches = []
    for k in range(n_batches):
        bstage = f"{stage}.b{k}"
        prior = log.read(bstage)
        if prior is not None:
            total += prior["rows"]
            done_batches.append(k)
            continue
        if fail_after_batches is not None and len(done_batches) >= fail_after_batches:
            raise RuntimeError(f"injected kill after {fail_after_batches} batches")
        from pyspark.sql import Observation

        obs = Observation(f"obs_{bstage}")
        part = staged.filter(F.col("conv_bucket") % n_batches == k).observe(
            obs, F.count(F.lit(1)).alias("rows")
        )
        (
            part.sortWithinPartitions("conv_bucket", *order_cols)
            .write.mode("overwrite")
            .options(**parquet_text_options(part))
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("conv_bucket")
            .parquet(path)
        )
        rows = obs.get["rows"]
        buckets = [b for b in range(n_buckets) if b % n_batches == k]
        lineage = [
            e
            for e in file_lineage(path)
            if any(e["file"].startswith(f"conv_bucket={b}/") for b in buckets)
        ]
        assert sum(e["rows"] for e in lineage) == rows, "bucket lineage drift"
        log.record(bstage, {"rows": rows, "path": path, "buckets": buckets, "lineage": lineage})
        total += rows
        done_batches.append(k)
    if log.read(stage) is None:
        log.record(stage, {"rows": total, "path": path, "batches": n_batches, "buckets": n_buckets})
    return total


def read_manifest(spark: SparkSession, out_dir: str) -> dict:
    """All recorded stages as {stage: payload}."""
    ckpt_dir = os.path.join(out_dir, "_checkpoints")
    result = {}
    if not os.path.isdir(ckpt_dir):
        return result
    for fname in sorted(os.listdir(ckpt_dir)):
        if fname.endswith(".json"):
            with open(os.path.join(ckpt_dir, fname)) as f:
                payload = json.load(f)
            result[payload["stage"]] = payload
    return result
