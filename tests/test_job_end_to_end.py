"""End-to-end pipeline: routed sink writes, per-sink counts vs the
reference oracle, and kill-and-resume idempotency (BASELINE.md targets)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from aws_log_ingestion_spark.config import PipelineConfig
from aws_log_ingestion_spark.operators import checkpoint as ckpt
from aws_log_ingestion_spark.plans.job import run_pipeline
from aws_log_ingestion_spark.sources import datagen
from reference_oracle import (
    load_reference,
    oracle_entry_type,
    oracle_filtered_messages,
    rows_to_entry,
)


def _expected_counts():
    """Per-sink row counts computed with the reference's own functions."""
    counts = {"infra_lambda_rows": 0, "infra_vpc_rows": 0, "infra_other_rows": 0, "logging_rows": 0}
    names = sorted(datagen.TEMPLATES)
    for i, name in enumerate(names):
        conv_id = f"c{i}"
        rows = datagen.template_rows(name, conv_id)
        tool = rows[0]["tool"]
        entry = rows_to_entry(rows, datagen.log_group_for(tool, conv_id), "s", "o")
        etype = oracle_entry_type(entry)
        if etype == "lambda":
            counts["infra_lambda_rows"] += len(oracle_filtered_messages(entry))
        elif etype == "vpc":
            counts["infra_vpc_rows"] += len(rows)
        else:
            counts["infra_other_rows"] += len(rows)
        counts["logging_rows"] += len(rows)  # unfiltered tee (reference :270)
    return counts


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("pipeline_out"))


def test_per_sink_counts_match_reference(spark, template_df, template_meta_df, run_dir):
    cfg = PipelineConfig(logging_enabled=True)
    result = run_pipeline(spark, template_df, template_meta_df, run_dir, cfg, resume=False)
    assert result["counts"] == _expected_counts()


def test_sink_files_ordered_and_readable(spark, run_dir):
    lam = spark.read.parquet(f"{run_dir}/infra").filter(F.col("sink") == "lambda")
    assert lam.count() > 0
    # per-turn order within each conversation is reconstructible
    idx = sorted(datagen.TEMPLATES).index("lambda_full")
    got = lam.filter(F.col("conv_id") == f"c{idx}").orderBy("turn_idx").select("text").collect()
    assert [r["text"] for r in got] == [datagen.NR_SHORT, datagen.REPORT]


def test_chunk_manifest_written(run_dir):
    manifest = ckpt.read_manifest(None, run_dir)
    assert "chunks" in manifest
    totals = manifest["chunks"]["totals"]
    assert {t["path"] for t in totals} == {"infra", "logging"}
    by = {(t["sink"], t["path"]): t for t in totals}
    # logging tee covers every conversation regardless of sink
    names = sorted(datagen.TEMPLATES)
    assert sum(t["n_convs"] for t in totals if t["path"] == "logging") == len(names)
    # the fast count stage proves counts arithmetically; n_chunks >= convs
    assert all(t["n_chunks"] >= t["n_convs"] for t in totals)
    assert all(t["raw_bytes"] > 0 for t in totals)


def test_resume_is_idempotent(spark, template_df, template_meta_df, run_dir):
    """Re-running over an existing checkpoint dir reproduces identical
    counts without rewriting (manifest wall-times unchanged)."""
    before = ckpt.read_manifest(None, run_dir)
    cfg = PipelineConfig(logging_enabled=True)
    result2 = run_pipeline(spark, template_df, template_meta_df, run_dir, cfg, resume=True)
    after = ckpt.read_manifest(None, run_dir)
    assert result2["counts"] == _expected_counts()
    for stage, payload in before.items():
        assert after[stage]["wall_time"] == payload["wall_time"], f"{stage} was rewritten"


def test_partial_failure_resume(spark, template_df, template_meta_df, tmp_path):
    """Simulate a mid-job kill: only the hub stage completes, then resume —
    final counts equal a clean run's and the hub is not rewritten."""
    out = str(tmp_path / "partial")
    cfg = PipelineConfig(logging_enabled=True)
    from aws_log_ingestion_spark.plans.job import prepare

    log = ckpt.CheckpointLog(out)
    ckpt.observed_write(
        prepare(template_df, template_meta_df, cfg), f"{out}/classified", log, "classified"
    )
    assert not log.is_done("infra") and not log.is_done("logging")
    hub_time = log.read("classified")["wall_time"]

    result = run_pipeline(spark, template_df, template_meta_df, out, cfg, resume=True)
    assert result["counts"] == _expected_counts()
    assert ckpt.read_manifest(None, out)["classified"]["wall_time"] == hub_time


def test_mid_stage_kill_resumes_per_conv_range(
    spark, template_df, template_meta_df, tmp_path
):
    """Kill INSIDE the hub stage after 2 of 4 conversation-range batches:
    resume completes only the missing ranges (completed batch records are
    not rewritten) and converges to a clean run's counts."""
    out = str(tmp_path / "midstage")
    cfg = PipelineConfig(logging_enabled=True)
    from aws_log_ingestion_spark.plans.job import prepare

    log = ckpt.CheckpointLog(out)
    hub_df = prepare(template_df, template_meta_df, cfg)
    with pytest.raises(RuntimeError, match="injected kill"):
        ckpt.observed_write_bucketed(
            hub_df, f"{out}/classified", log, "classified", fail_after_batches=2
        )
    done = [k for k in range(4) if log.read(f"classified.b{k}") is not None]
    assert len(done) == 2
    times = {k: log.read(f"classified.b{k}")["wall_time"] for k in done}

    result = run_pipeline(spark, template_df, template_meta_df, out, cfg, resume=True)
    assert result["counts"] == _expected_counts()
    for k, t in times.items():
        assert log.read(f"classified.b{k}")["wall_time"] == t, f"range batch {k} rewritten"
    assert sum(log.read(f"classified.b{k}")["rows"] for k in range(4)) == template_df.count()
    # lineage covers every bucket exactly once across batches
    buckets = [b for k in range(4) for b in log.read(f"classified.b{k}")["buckets"]]
    assert sorted(buckets) == list(range(32))


def test_iceberg_branch_selection(spark, tmp_path):
    """VERDICT r3 #7: sinks route through an Iceberg catalog ONLY when
    both the catalog conf and the runtime jar are present; this sandbox
    has neither, and a conf WITHOUT the jar must still fall back to
    parquet (recorded loud in the manifest) instead of failing writes."""
    from aws_log_ingestion_spark.operators import checkpoint as ckpt

    class _FakeConf:
        def __init__(self, pairs):
            self._p = pairs

        def getAll(self):
            return self._p

    class _FakeJvmClassForName:
        def forName(self, name):
            raise Exception("no iceberg jar")

    class _FakeSpark:
        def __init__(self, pairs):
            self.sparkContext = type(
                "SC", (), {"getConf": lambda s: _FakeConf(pairs)}
            )()
            self._jvm = type(
                "JVM", (), {"java": type("J", (), {"lang": type("L", (), {"Class": _FakeJvmClassForName()})()})()}
            )()

    # catalog configured, jar absent -> parquet fallback, decision recorded
    fake = _FakeSpark(
        [
            ("spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog"),
            ("spark.sql.catalog.ice.type", "hadoop"),
            ("spark.app.name", "x"),
        ]
    )
    assert ckpt.configured_catalogs(fake) == ["ice"]
    assert ckpt.iceberg_available(fake) is False
    assert ckpt.iceberg_catalog(fake) is None
    fmt = ckpt.sink_format(fake)
    assert fmt == {
        "format": "parquet",
        "catalog": None,
        "catalogs_configured": ["ice"],
        "iceberg_runtime": False,
    }

    # no catalog at all (the live session) -> parquet, and observed_write
    # records the branch decision in the stage manifest
    assert ckpt.sink_format(spark)["format"] == "parquet"
    out = str(tmp_path / "sink")
    log = ckpt.CheckpointLog(out)
    df = spark.createDataFrame(
        [("c1", 0, "a"), ("c1", 1, "b")], "conv_id string, turn_idx int, text string"
    )
    rows = ckpt.observed_write(df, f"{out}/t", log, "t")
    rec = log.read("t")
    assert rows == 2 and rec["rows"] == 2
    assert rec["format"] == "parquet" and rec["catalog"] is None
    assert sum(e["rows"] for e in rec["lineage"]) == 2
