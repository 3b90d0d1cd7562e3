"""Incremental ingest (plans/incremental.py): per-batch file diffing,
batch-equivalence with the one-shot pipeline, and conversation-scoped
copy-on-write recompute when late turns extend existing conversations.

The equivalence target is exact: after any sequence of incremental runs,
every sink's row multiset equals ``run_pipeline`` over the full current
input. The overlap batch includes a conversation whose extension FLIPS
its classification (an ``other`` conversation gains an NR marker line →
the whole conversation becomes ``lambda`` and the infra filter applies),
which only a conversation-scoped recompute can get right — a row-local
append would leave the old rows routed to the stale sink.
"""

from __future__ import annotations

import datetime
import os
import shutil

import pytest
from pyspark.sql import functions as F

from aws_log_ingestion_spark.config import PipelineConfig
from aws_log_ingestion_spark.plans.incremental import run_incremental
from aws_log_ingestion_spark.plans.job import run_pipeline
from aws_log_ingestion_spark.sources.derive import (
    conv_meta_from_transcripts,
    transcripts_from_events,
)

SF_DIR = "/root/testdata/sf0.001"
CFG = PipelineConfig(logging_enabled=True)

# conversations extended in batch C (late turns appended):
#   c0:  user 0 % 8 == 0 → lambda conv; extension lines carry no
#        RequestId, so their lambda_request_id must be forward-filled
#        from the conversation's OLD tail (cross-batch fill).
#   c3:  user 3 % 8 == 3 → lambda log-group but no lambda message →
#        sink 'other'; the extension adds an NR marker line, flipping
#        the WHOLE conversation to sink 'lambda'.
EXT_FILL_CONV = "c0"
EXT_FLIP_CONV = "c3"
NR_SHORT = '[1,"NR_LAMBDA_MONITORING","H4sIAImox"]'


def _grp(conv_id_col):
    return F.substring(conv_id_col, 2, 10).cast("int") % 3


def _copy_parts(src_dir: str, in_dir: str, prefix: str) -> None:
    """Move a Spark write's part files into the shared input dir under
    stable names (the input contract is a growing set of files)."""
    i = 0
    for fname in sorted(os.listdir(src_dir)):
        if fname.endswith(".parquet"):
            shutil.copy(
                os.path.join(src_dir, fname),
                os.path.join(in_dir, f"{prefix}_{i}.parquet"),
            )
            i += 1
    assert i > 0


def _extension_rows(spark, transcripts):
    """Late-turn rows for the two extended conversations."""
    tails = {
        r["conv_id"]: r["m"]
        for r in transcripts.filter(
            F.col("conv_id").isin(EXT_FILL_CONV, EXT_FLIP_CONV)
        )
        .groupBy("conv_id")
        .agg(F.max("turn_idx").alias("m"))
        .collect()
    }
    ts = datetime.datetime(2026, 1, 1)
    rows = [
        (EXT_FILL_CONV, tails[EXT_FILL_CONV] + 1, "assistant",
         "late line with no request id", "lambda", ts),
        (EXT_FILL_CONV, tails[EXT_FILL_CONV] + 2, "tool",
         "another late line", "lambda", ts),
        (EXT_FLIP_CONV, tails[EXT_FLIP_CONV] + 1, "system",
         NR_SHORT, "lambda", ts),
    ]
    return spark.createDataFrame(
        rows, schema=transcripts.select(
            "conv_id", "turn_idx", "role", "text", "tool", "ts"
        ).schema
    )


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    """Three conversation-aligned input batches + the incremental out dir."""
    base = tmp_path_factory.mktemp("incremental")
    in_dir = str(base / "input")
    os.makedirs(in_dir)
    transcripts = transcripts_from_events(spark, SF_DIR)
    stage = str(base / "stage")
    batches = {
        "a": transcripts.filter(_grp(F.col("conv_id")) == 0),
        "b": transcripts.filter(_grp(F.col("conv_id")) == 1),
    }
    ext = _extension_rows(spark, batches["a"])
    batches["c"] = transcripts.filter(_grp(F.col("conv_id")) == 2).unionByName(ext)
    for name, df in batches.items():
        df.repartition(2).write.mode("overwrite").parquet(f"{stage}/{name}")
    return {
        "in_dir": in_dir,
        "stage": stage,
        "out": str(base / "out"),
        "oneshot": str(base / "oneshot"),
    }


def _sorted_cols(df):
    return df.select(*sorted(df.columns))


def _assert_same_rows(got, want, label):
    got, want = _sorted_cols(got), _sorted_cols(want)
    assert sorted(got.columns) == sorted(want.columns), label
    assert got.exceptAll(want).count() == 0, f"{label}: extra rows"
    assert want.exceptAll(got).count() == 0, f"{label}: missing rows"


def _oneshot(spark, in_dir, out_dir):
    """run_pipeline over the full current input (the equivalence target)."""
    full = spark.read.parquet(in_dir)
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    return run_pipeline(
        spark, full, conv_meta_from_transcripts(full), out_dir, CFG, resume=False
    )


def _compare_outputs(spark, inc_out, one_out):
    for sink, drop_inc, drop_one in [
        ("classified", ["ingest_batch", "conv_bucket"], ["conv_bucket"]),
        ("infra", ["ingest_batch"], []),
        ("logging", ["ingest_batch"], []),
        ("chunk_stats", ["ingest_batch"], []),
    ]:
        got = spark.read.parquet(f"{inc_out}/{sink}").drop(*drop_inc)
        want = spark.read.parquet(f"{one_out}/{sink}").drop(*drop_one)
        _assert_same_rows(got, want, sink)


def test_b0_bootstrap_equals_oneshot(spark, env):
    _copy_parts(f"{env['stage']}/a", env["in_dir"], "batch_a")
    result = run_incremental(spark, env["in_dir"], env["out"], CFG)
    assert result["batch_id"] == 0
    assert result["superseded_convs"] == 0
    one = _oneshot(spark, env["in_dir"], env["oneshot"])
    assert result["counts"] == one["counts"]
    _compare_outputs(spark, env["out"], env["oneshot"])


def test_b1_disjoint_append(spark, env):
    _copy_parts(f"{env['stage']}/b", env["in_dir"], "batch_b")
    result = run_incremental(spark, env["in_dir"], env["out"], CFG)
    assert result["batch_id"] == 1
    assert result["superseded_convs"] == 0  # conversation-aligned batch
    one = _oneshot(spark, env["in_dir"], env["oneshot"])
    assert result["counts"] == one["counts"]
    _compare_outputs(spark, env["out"], env["oneshot"])


def test_b2_overlap_copy_on_write(spark, env):
    _copy_parts(f"{env['stage']}/c", env["in_dir"], "batch_c")
    result = run_incremental(spark, env["in_dir"], env["out"], CFG)
    assert result["batch_id"] == 2
    assert result["superseded_convs"] == 2  # c0 (fill) + c3 (flip)
    one = _oneshot(spark, env["in_dir"], env["oneshot"])
    assert result["counts"] == one["counts"]
    _compare_outputs(spark, env["out"], env["oneshot"])

    hub = spark.read.parquet(f"{env['out']}/classified")
    extended = hub.filter(F.col("conv_id").isin(EXT_FILL_CONV, EXT_FLIP_CONV))
    # COW removed the superseded conversations from the old batches…
    assert extended.filter(F.col("ingest_batch") < 2).count() == 0
    # …and the recomputed rows live (once) in the new batch
    assert (
        extended.groupBy("conv_id", "turn_idx").count().filter("count > 1").count()
        == 0
    )
    # classification flip: EVERY row of c3 (old turns included) is lambda now
    flip = hub.filter(F.col("conv_id") == EXT_FLIP_CONV)
    assert flip.filter(F.col("sink") != "lambda").count() == 0
    # cross-batch forward fill: the late no-RequestId lines inherit the
    # request id from the conversation's old tail
    late = (
        spark.read.parquet(f"{env['out']}/logging")
        .filter(
            (F.col("conv_id") == EXT_FILL_CONV)
            & F.col("message").startswith("late line")
        )
        .select("lambda_request_id")
        .collect()
    )
    assert len(late) == 1 and late[0]["lambda_request_id"]


def test_noop_when_no_new_files(spark, env):
    before = run_incremental(spark, env["in_dir"], env["out"], CFG)
    assert before["batch_id"] is None
    assert before["new_files"] == []
    one = _oneshot(spark, env["in_dir"], env["oneshot"])
    assert before["counts"] == one["counts"]


def test_changed_file_rejected(spark, env, tmp_path):
    victim = os.path.join(env["in_dir"], "batch_a_0.parquet")
    original = victim + ".orig"
    shutil.copy(victim, original)
    try:
        with open(victim, "ab") as f:
            f.write(b"x")
        with pytest.raises(ValueError, match="append-only"):
            run_incremental(spark, env["in_dir"], env["out"], CFG)
    finally:
        os.replace(original, victim)


def test_config_change_rejected(spark, env):
    with pytest.raises(ValueError, match="config changed"):
        run_incremental(
            spark, env["in_dir"], env["out"], PipelineConfig(logging_enabled=False)
        )


@pytest.fixture(scope="module")
def kill_env(spark, env, tmp_path_factory):
    """A fresh 2-batch sequence (A, then the overlap batch C) for the
    mid-kill resume probes — reusing env's staged batch files."""
    base = tmp_path_factory.mktemp("inc_kill")
    in_dir = str(base / "input")
    os.makedirs(in_dir)
    _copy_parts(f"{env['stage']}/a", in_dir, "batch_a")
    return {
        "in_dir": in_dir,
        "stage": env["stage"],
        "out": str(base / "out"),
        "oneshot": str(base / "oneshot"),
    }


def test_kill_after_staging_resumes(spark, kill_env):
    assert run_incremental(spark, kill_env["in_dir"], kill_env["out"], CFG)[
        "batch_id"
    ] == 0
    _copy_parts(f"{kill_env['stage']}/c", kill_env["in_dir"], "batch_c")
    with pytest.raises(RuntimeError, match="injected kill at staged"):
        run_incremental(spark, kill_env["in_dir"], kill_env["out"], CFG,
                        fail_at="staged")
    result = run_incremental(spark, kill_env["in_dir"], kill_env["out"], CFG)
    assert result["batch_id"] == 1
    assert result["superseded_convs"] == 2
    one = _oneshot(spark, kill_env["in_dir"], kill_env["oneshot"])
    assert result["counts"] == one["counts"]
    _compare_outputs(spark, kill_env["out"], kill_env["oneshot"])


def test_kill_before_cow_resumes(spark, kill_env, tmp_path_factory):
    """Kill AFTER the new batch's writes but BEFORE the COW commit: the
    hub transiently holds the superseded conversations twice; the re-run
    must converge to the deduplicated final state."""
    base = tmp_path_factory.mktemp("inc_kill2")
    in_dir = str(base / "input")
    os.makedirs(in_dir)
    _copy_parts(f"{kill_env['stage']}/a", in_dir, "batch_a")
    out = str(base / "out")
    assert run_incremental(spark, in_dir, out, CFG)["batch_id"] == 0
    _copy_parts(f"{kill_env['stage']}/c", in_dir, "batch_c")
    with pytest.raises(RuntimeError, match="injected kill at new_batch"):
        run_incremental(spark, in_dir, out, CFG, fail_at="new_batch")
    # the manifest has no batch record yet, so the re-run redoes batch 1
    result = run_incremental(spark, in_dir, out, CFG)
    assert result["batch_id"] == 1
    assert result["superseded_convs"] == 2
    one = _oneshot(spark, in_dir, str(base / "oneshot"))
    assert result["counts"] == one["counts"]
    _compare_outputs(spark, out, str(base / "oneshot"))


def test_b3_double_supersede_extension_only_batch(spark, env):
    """Batch D holds ONLY late turns for a conversation already
    recomputed into batch 2 by the previous overlap — the COW must chase
    the conversation to its CURRENT batch, and a batch with zero new
    conversations must still commit cleanly."""
    hub = spark.read.parquet(f"{env['out']}/classified")
    tail = (
        hub.filter(F.col("conv_id") == EXT_FILL_CONV)
        .agg(F.max("turn_idx").alias("m"))
        .collect()[0]["m"]
    )
    ts = datetime.datetime(2026, 2, 1)
    ext2 = spark.createDataFrame(
        [(EXT_FILL_CONV, tail + 1, "user", "second extension line", "lambda", ts)],
        schema=hub.select("conv_id", "turn_idx", "role", "text", "tool", "ts").schema,
    )
    ext2.coalesce(1).write.mode("overwrite").parquet(f"{env['stage']}/d")
    _copy_parts(f"{env['stage']}/d", env["in_dir"], "batch_d")

    result = run_incremental(spark, env["in_dir"], env["out"], CFG)
    assert result["batch_id"] == 3
    assert result["superseded_convs"] == 1
    one = _oneshot(spark, env["in_dir"], env["oneshot"])
    assert result["counts"] == one["counts"]
    _compare_outputs(spark, env["out"], env["oneshot"])

    hub = spark.read.parquet(f"{env['out']}/classified")
    where = (
        hub.filter(F.col("conv_id") == EXT_FILL_CONV)
        .select("ingest_batch")
        .distinct()
        .collect()
    )
    # the conversation now lives ONLY in batch 3 (chased out of batch 2)
    assert [r["ingest_batch"] for r in where] == [3]


def test_hub_lookup_prunes_partitions(spark, env):
    from aws_log_ingestion_spark.plans.incremental import hub_lookup

    looked = hub_lookup(spark, env["out"], EXT_FLIP_CONV)
    full = (
        spark.read.parquet(f"{env['out']}/classified")
        .filter(F.col("conv_id") == EXT_FLIP_CONV)
    )
    got = sorted(map(tuple, looked.select(*sorted(looked.columns)).collect()))
    want = sorted(map(tuple, full.select(*sorted(full.columns)).collect()))
    assert got and got == want
    # plan-level: the conv_bucket predicate lands in PartitionFilters,
    # so the scan reads one bucket directory per batch, not the table
    plan = looked._jdf.queryExecution().executedPlan().toString()
    import re
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "conv_bucket" in pf.group(1), plan


@pytest.fixture(scope="module")
def split_c(spark, env):
    """Batch C split into extensions-only and new-convs-only file sets."""
    a = spark.read.parquet(f"{env['stage']}/a")
    ext = _extension_rows(spark, a)
    ext.coalesce(1).write.mode("overwrite").parquet(f"{env['stage']}/c_ext")
    t = transcripts_from_events(spark, SF_DIR)
    t.filter(_grp(F.col("conv_id")) == 2).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{env['stage']}/c_new")
    return env["stage"]


def _fresh(tmp_path_factory, stage, name):
    base = tmp_path_factory.mktemp(name)
    in_dir = str(base / "input")
    os.makedirs(in_dir)
    _copy_parts(f"{stage}/a", in_dir, "batch_a")
    return in_dir, str(base / "out"), str(base / "oneshot")


def test_files_arriving_during_recovery_restage(spark, split_c, tmp_path_factory):
    """Kill at 'staged', then MORE input files arrive before the re-run:
    the frozen overlap decision no longer covers the batch, so the
    re-run must restage over the full new-file set (nothing was mutated
    yet) — otherwise the extra files' overlaps would duplicate rows."""
    in_dir, out, oneshot = _fresh(tmp_path_factory, split_c, "inc_regrow")
    assert run_incremental(spark, in_dir, out, CFG)["batch_id"] == 0
    # the kill happens with a NO-overlap file set staged (affected = []);
    # the files that arrive next DO overlap — replaying the frozen
    # decision would duplicate c0/c3 across batches 0 and 1
    _copy_parts(f"{split_c}/c_new", in_dir, "batch_c_new")
    with pytest.raises(RuntimeError, match="injected kill at staged"):
        run_incremental(spark, in_dir, out, CFG, fail_at="staged")
    _copy_parts(f"{split_c}/c_ext", in_dir, "batch_c_ext")
    result = run_incremental(spark, in_dir, out, CFG)
    assert result["batch_id"] == 1
    assert result["superseded_convs"] == 2
    one = _oneshot(spark, in_dir, oneshot)
    assert result["counts"] == one["counts"]
    _compare_outputs(spark, out, oneshot)


def test_files_arriving_after_cow_commit_refused(spark, split_c, tmp_path_factory):
    """Kill at 'cow' (old batches already rewritten), then more files
    arrive: the batch can no longer be re-derived, so the run refuses
    loudly; finishing with the original file set first, then ingesting
    the extra files as the next batch, converges."""
    in_dir, out, oneshot = _fresh(tmp_path_factory, split_c, "inc_cowgrow")
    assert run_incremental(spark, in_dir, out, CFG)["batch_id"] == 0
    _copy_parts(f"{split_c}/c_ext", in_dir, "batch_c_ext")
    with pytest.raises(RuntimeError, match="injected kill at cow"):
        run_incremental(spark, in_dir, out, CFG, fail_at="cow")
    _copy_parts(f"{split_c}/c_new", in_dir, "batch_c_new")
    with pytest.raises(ValueError, match="during recovery"):
        run_incremental(spark, in_dir, out, CFG)
    # finish the killed batch with its original file set…
    extra = [
        os.path.join(in_dir, f)
        for f in os.listdir(in_dir)
        if f.startswith("batch_c_new")
    ]
    held = {}
    for p in extra:
        held[p] = p + ".held"
        os.replace(p, held[p])
    assert run_incremental(spark, in_dir, out, CFG)["batch_id"] == 1
    # …then the extra files land as the NEXT batch
    for p, h in held.items():
        os.replace(h, p)
    result = run_incremental(spark, in_dir, out, CFG)
    assert result["batch_id"] == 2
    one = _oneshot(spark, in_dir, oneshot)
    assert result["counts"] == one["counts"]
    _compare_outputs(spark, out, oneshot)


def test_files_arriving_during_new_batch_recovery_restage(
    spark, split_c, tmp_path_factory
):
    """ADVICE r6 (high): kill at 'new_batch' — the batch's hub/sink
    partitions are already on disk, the .cow record is NOT — then more
    input files arrive before the re-run. The restage must derive the
    overlap from the OLD batches only (ingest_batch != batch_id):
    reading the half-written batch would duplicate its rows into
    superseded_raw and rmtree the freshly rewritten batch's own
    partitions with empty retained rows, silently dropping
    conversations. Mirrors test_files_arriving_during_recovery_restage
    one failure window later."""
    in_dir, out, oneshot = _fresh(tmp_path_factory, split_c, "inc_nbgrow")
    assert run_incremental(spark, in_dir, out, CFG)["batch_id"] == 0
    # overlapping extension files are staged AND the new batch is fully
    # written (ingest_batch=1 partitions exist) when the kill hits
    _copy_parts(f"{split_c}/c_ext", in_dir, "batch_c_ext")
    with pytest.raises(RuntimeError, match="injected kill at new_batch"):
        run_incremental(spark, in_dir, out, CFG, fail_at="new_batch")
    # growth during recovery -> restage over the full file set
    _copy_parts(f"{split_c}/c_new", in_dir, "batch_c_new")
    result = run_incremental(spark, in_dir, out, CFG)
    assert result["batch_id"] == 1
    one = _oneshot(spark, in_dir, oneshot)
    assert result["counts"] == one["counts"]
    _compare_outputs(spark, out, oneshot)


def test_nonempty_tags_fingerprint_stable_across_runs(
    spark, split_c, tmp_path_factory
):
    """ADVICE r6 (medium): dict-valued config fields (tags) fingerprint
    as lists-of-tuples, which JSON round-trips to lists-of-lists — with
    any non-empty tags the second run used to raise 'config changed'."""
    cfg = PipelineConfig(logging_enabled=True, tags={"team": "ingest", "env": "ci"})
    in_dir, out, _ = _fresh(tmp_path_factory, split_c, "inc_tags")
    assert run_incremental(spark, in_dir, out, cfg)["batch_id"] == 0
    _copy_parts(f"{split_c}/c_new", in_dir, "batch_c_new")
    result = run_incremental(spark, in_dir, out, cfg)  # must not raise
    assert result["batch_id"] == 1


def test_deleted_recorded_input_file_refused(spark, split_c, tmp_path_factory):
    """ADVICE r6 (low): a recorded input file deleted from in_dir breaks
    the append-only invariant — refuse loudly instead of keeping output
    rows for inputs that no longer exist."""
    in_dir, out, _ = _fresh(tmp_path_factory, split_c, "inc_del")
    assert run_incremental(spark, in_dir, out, CFG)["batch_id"] == 0
    victim = next(
        f for f in sorted(os.listdir(in_dir)) if f.endswith(".parquet")
    )
    os.remove(os.path.join(in_dir, victim))
    _copy_parts(f"{split_c}/c_new", in_dir, "batch_c_new")
    with pytest.raises(ValueError, match="missing"):
        run_incremental(spark, in_dir, out, CFG)
