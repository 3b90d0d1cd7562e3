"""Table maintenance (plans/maintenance.py): small-file compaction
preserves the row multiset and partition layout while cutting file
counts; bucketization yields the zero-exchange per-conversation plan."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Window, functions as F

from aws_log_ingestion_spark.plans.maintenance import (
    bucketize_transcripts,
    compact_parquet_root,
    leaf_dirs,
    plan_compaction,
)
from aws_log_ingestion_spark.sources.derive import transcripts_from_events

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def fragmented_root(spark, tmp_path_factory):
    """A sink-shaped partitioned root written deliberately fragmented:
    8 shuffle files per partition directory."""
    root = str(tmp_path_factory.mktemp("maint") / "sink")
    t = transcripts_from_events(spark, SF_DIR)
    (
        t.withColumn("sink", F.col("tool"))
        .repartition(8)
        .write.partitionBy("sink")
        .parquet(root)
    )
    return root


def test_compaction_plan_targets_fragmented_leaves(fragmented_root):
    jobs = plan_compaction(fragmented_root, target_bytes=1 << 30)
    dirs = {j["dir"] for j in jobs}
    assert dirs == set(leaf_dirs(fragmented_root))  # every leaf is fragmented
    assert all(j["files_before"] > j["target_files"] == 1 for j in jobs)


def test_compact_preserves_rows_and_layout(spark, fragmented_root):
    before = spark.read.parquet(fragmented_root)
    # materialise the pre-compaction multiset eagerly — the compaction
    # below replaces the files this lazy DataFrame would re-list
    before_rows = sorted(map(tuple, before.select(*sorted(before.columns)).collect()))
    rows_before = len(before_rows)
    leaves_before = set(leaf_dirs(fragmented_root))

    report = compact_parquet_root(spark, fragmented_root, target_bytes=1 << 30)
    assert len(report["rewritten"]) == len(leaves_before)
    assert report["rows"] == rows_before

    after_files = leaf_dirs(fragmented_root)
    assert set(after_files) == leaves_before  # partition dirs unchanged
    assert all(len(parts) == 1 for parts in after_files.values())

    after = spark.read.parquet(fragmented_root)
    after_rows = sorted(map(tuple, after.select(*sorted(after.columns)).collect()))
    assert after_rows == before_rows
    # within-file clustering preserved: each compacted file is sorted
    # by (conv_id, turn_idx)
    leaf, parts = next(iter(after_files.items()))
    one = spark.read.parquet(os.path.join(fragmented_root, leaf, parts[0]["file"]))
    got = one.select("conv_id", "turn_idx").collect()
    assert got == sorted(got, key=lambda r: (r["conv_id"], r["turn_idx"]))

    # no staging residue
    assert not os.path.exists(fragmented_root.rstrip("/") + "._compaction")


def test_compact_is_idempotent_noop(spark, fragmented_root):
    report = compact_parquet_root(spark, fragmented_root, target_bytes=1 << 30)
    assert report["rewritten"] == []
    assert report["skipped"] == len(leaf_dirs(fragmented_root))


def test_bucketize_zero_exchange_plan(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketize")
    t = transcripts_from_events(spark, SF_DIR)
    t.repartition(8).write.parquet(str(base / "random"))

    bucketed = bucketize_transcripts(
        spark,
        str(base / "random"),
        str(base / "bucketed"),
        table_name="test_transcripts_bucketed",
        n_buckets=8,
    )
    assert bucketed.count() == t.count()

    # the hub's shape: a conv_id window over the bucketed table needs no
    # fact-side shuffle — the scan itself provides the clustering
    w = Window.partitionBy("conv_id")
    out = bucketed.withColumn("conv_max", F.max("turn_idx").over(w))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan

    # the same window over the random layout DOES shuffle (the delta the
    # bucketed-ingest bench rows measure)
    rand = spark.read.parquet(str(base / "random"))
    plan_rand = (
        rand.withColumn("conv_max", F.max("turn_idx").over(w))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange hashpartitioning" in plan_rand, plan_rand
    spark.sql("DROP TABLE IF EXISTS test_transcripts_bucketed")


def test_compact_refuses_bucketed_table_dir(spark, tmp_path_factory):
    """Bucket ids live in the file names; compaction would brick the
    table (Spark raises INVALID_BUCKET_FILE on read — probed). Refuse."""
    base = tmp_path_factory.mktemp("bucket_guard")
    t = transcripts_from_events(spark, SF_DIR)
    t.repartition(4).write.parquet(str(base / "random"))
    bucketize_transcripts(
        spark,
        str(base / "random"),
        str(base / "bucketed"),
        table_name="test_bucket_guard",
        n_buckets=4,
    )
    with pytest.raises(ValueError, match="Hive-bucketed"):
        compact_parquet_root(spark, str(base / "bucketed"), target_bytes=1 << 30)
    spark.sql("DROP TABLE IF EXISTS test_bucket_guard")


def test_mid_swap_marker_detected_and_refused(spark, tmp_path_factory):
    """ADVICE r6: a kill between a leaf's remove and move loops must
    leave an on-disk marker, and maintenance must refuse to operate on a
    table with a mid-swap leaf instead of reading it silently truncated."""
    import json

    from aws_log_ingestion_spark.plans.maintenance import (
        SWAP_MARKER,
        swap_markers,
    )

    root = str(tmp_path_factory.mktemp("maint_swap") / "sink")
    t = transcripts_from_events(spark, SF_DIR)
    t.withColumn("sink", F.col("tool")).repartition(4).write.partitionBy(
        "sink"
    ).parquet(root)

    # simulate the crash window: marker present in one leaf
    leaf = os.path.join(root, sorted(leaf_dirs(root))[0])
    with open(os.path.join(leaf, SWAP_MARKER), "w") as f:
        json.dump({"staging": "/nowhere", "rows": 0}, f)
    assert swap_markers(root) != []
    with pytest.raises(RuntimeError, match="mid-swap"):
        plan_compaction(root, target_bytes=1 << 30)
    with pytest.raises(RuntimeError, match="mid-swap"):
        compact_parquet_root(spark, root, target_bytes=1 << 30)

    # marker cleared -> compaction proceeds and leaves no markers behind
    os.remove(os.path.join(leaf, SWAP_MARKER))
    report = compact_parquet_root(spark, root, target_bytes=1 << 30)
    assert report["rewritten"] != []
    assert swap_markers(root) == []
