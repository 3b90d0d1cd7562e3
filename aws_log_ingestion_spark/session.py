"""SparkSession factory tuned for the pipeline.

Local-mode knobs are proxies for cluster settings: on a real 1000-executor
cluster the same builder is used with ``master`` unset (picked up from
spark-submit) and ``spark.sql.shuffle.partitions`` sized to ~2-3x total
cores. AQE is on so the shuffle partition count self-corrects at runtime
(coalesce for small stages, skew-split for hot conversations).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _heap_for(cores: int | None) -> str:
    """Heap scales with task-slot count (1.5 GB/core, floor 16 GB).

    This is the cluster-faithful model: a real N-executor cluster has
    N x executor-memory total, so a 4N-core local[] arm must get ~4x the
    heap of the N-core arm — a FIXED heap starves the wide arm's G1
    (measured: local[32] on 15M turns, 16g -> 394 CPU-s, 48g -> 299
    CPU-s and 16.1s -> 12.0s wall). SPARK_DRIVER_MEMORY still overrides.
    """
    if cores is None:
        return "16g"
    return f"{max(16, int(cores * 1.5))}g"


def get_spark(
    app_name: str = "transcript-log-pipeline",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores=None`` leaves the master to spark-submit (cluster mode); an
    integer forces ``local[cores]`` (tests / bench). Shuffle partitions
    default to 2x cores locally — AQE coalesces down when input is small.
    """
    builder = SparkSession.builder.appName(app_name)
    # SPARK_GRAFT_MASTER overrides the topology without touching callers:
    # e.g. "local-cluster[4,8,14336]" = 4 SEPARATE executor JVMs x 8 cores
    # x 14 GiB workers — the faithful proxy for "N vs 4N executors" (own
    # heap/GC per executor, real netty shuffle between processes), unlike
    # one fat local[4N] JVM. ``cores`` keeps sizing shuffle partitions.
    master_env = os.environ.get("SPARK_GRAFT_MASTER")
    if master_env:
        builder = builder.master(master_env)
        if master_env.startswith("local-cluster"):
            import re as _re

            m = _re.match(r"local-cluster\[(\d+),(\d+),(\d+)\]", master_env)
            if not m:
                # A malformed string (spaces, 'g' suffix) would silently
                # leave executors at the 1g default and OOM at bench
                # scale with no hint why (ADVICE r3) — fail loud instead.
                raise ValueError(
                    f"SPARK_GRAFT_MASTER={master_env!r} does not match "
                    "local-cluster[nExec,coresPerExec,memMB] (memory must "
                    "be plain MB, no unit suffix)"
                )
            _n_exec, _exec_cores, mem_mb = (int(x) for x in m.groups())
            # executor heap fits inside the worker allowance; the
            # driver only plans/collects, so it keeps a small heap
            builder = builder.config(
                "spark.executor.memory", f"{max(mem_mb - 2048, 1024)}m"
            )
            repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            # executor Python workers must import this package
            builder = builder.config("spark.executorEnv.PYTHONPATH", repo_root)
    elif cores is not None:
        builder = builder.master(f"local[{cores}]")
    if cores is not None and shuffle_partitions is None:
        shuffle_partitions = max(2 * cores, 8)
    if shuffle_partitions is not None:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))

    builder = (
        builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # keep AQE from coalescing below the core count: the conv_id
        # window sort must use every core, not 3 fat partitions (default
        # advisory 64MB collapses small-but-CPU-heavy shuffles)
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.session.timeZone", "UTC")
        # subset-key co-partitioning (pre-3.3 behavior): a side already
        # hash-clustered on conv_id satisfies a join on
        # (conv_id, turn_idx) without re-shuffling — the bucketed-ingest
        # marker-join fill depends on this (operators/melt.py)
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batches feed the two pandas UDFs; 10k rows balances Python
        # worker latency against per-batch memory for long text columns.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # zstd default (storage-efficient finals); SPARK_GRAFT_PARQUET_CODEC
        # lets the bench A/B cheaper codecs for intermediate-heavy runs
        .config(
            "spark.sql.parquet.compression.codec",
            os.environ.get("SPARK_GRAFT_PARQUET_CODEC", "zstd"),
        )
        # committer v2: task commits rename straight into the destination
        # instead of a serial driver-side job-commit rename pass —
        # interleaved A/B on the 4x2-executor arm: 26.1s/181.7 CPU-s vs
        # 29.4s/203.7 base (~11% both measures; v2 won every rep). Safe
        # for the BATCH sinks because every batch write is gated by the
        # checkpoint manifest and fresh-start truncate
        # (operators/checkpoint.py): a mid-job failure's partial files
        # are truncated on resume. The streaming foreachBatch sinks have
        # no such truncate gate, so stream_job.py pins its appends back
        # to committer v1 per-write (ADVICE r4).
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config(
            "spark.driver.memory",
            os.environ.get(
                "SPARK_DRIVER_MEMORY",
                # under local-cluster the EXECUTORS hold the data; the
                # driver only plans and collects small results
                "8g" if (master_env or "").startswith("local-cluster") else _heap_for(cores),
            ),
        )
    )
    # GC/JVM experiments without code changes (e.g. -XX:+UseParallelGC)
    java_opts = os.environ.get("SPARK_DRIVER_JAVA_OPTIONS")
    if java_opts:
        builder = builder.config("spark.driver.extraJavaOptions", java_opts)
    # arbitrary conf overrides for A/B experiments:
    #   SPARK_GRAFT_EXTRA_CONF="k1=v1;k2=v2"
    extra_env = os.environ.get("SPARK_GRAFT_EXTRA_CONF")
    if extra_env:
        for kv in extra_env.split(";"):
            if kv.strip():
                k, v = kv.split("=", 1)
                builder = builder.config(k.strip(), v.strip())
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # DEBUG_LOGGING_ENABLED parity (/root/reference/src/function.py:353-359)
    from .config import debug_logging_enabled

    spark.sparkContext.setLogLevel(
        "DEBUG" if debug_logging_enabled(os.environ.get("DEBUG_LOGGING_ENABLED")) else "WARN"
    )
    return spark
