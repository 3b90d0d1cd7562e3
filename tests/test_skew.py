"""Hot-conversation skew: the two-pass salted forward-fill must equal the
naive window on a genuinely hot conversation (FIXTURES.md §4 hot_conv)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_log_ingestion_spark.functions import patterns as P
from aws_log_ingestion_spark.operators.classify import forward_fill, forward_fill_salted


def _hot_conv_df(spark, n_turns: int):
    """One conversation with n_turns; a RequestId START line every 1000
    turns, garbage elsewhere — worst case for the carry distance."""
    df = spark.range(n_turns).select(
        F.lit("hot").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.when(
            F.col("id") % 1000 == 0,
            F.concat(
                F.lit("START RequestId: "),
                F.lpad(F.col("id").cast("string"), 8, "0"),
                F.lit("-0000-4000-8000-000000000000 Version: $LATEST"),
            ),
        )
        .otherwise(F.lit("some garbage line"))
        .alias("text"),
    )
    return df.withColumn("rid", P.extract_request_id(F.col("text")))


def test_salted_fill_equals_naive_hot_conv(spark):
    df = _hot_conv_df(spark, 100_000).cache()
    naive = forward_fill(df, "rid", "fill").select("turn_idx", "fill")
    salted = forward_fill_salted(df, "rid", "fill", salt_range=7_000).select(
        "turn_idx", "fill"
    )
    # compare via hash aggregate, not collect (100k rows)
    def sig(d):
        return d.agg(
            F.sum(F.crc32(F.concat_ws("|", "turn_idx", "fill"))).alias("h"),
            F.count("fill").alias("n"),
        ).collect()[0]

    assert sig(naive) == sig(salted)
    df.unpersist()


def test_salted_fill_carry_across_empty_blocks(spark):
    """A block with no non-null values must inherit the carry from
    BEFORE the previous block (not just block-1)."""
    rows = [("c", 0, "v1"), ("c", 1, None), ("c", 2, None), ("c", 3, None),
            ("c", 4, None), ("c", 5, None), ("c", 6, "v2"), ("c", 7, None)]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "v"])
    got = {
        r["turn_idx"]: r["fill"]
        for r in forward_fill_salted(df, "v", "fill", salt_range=2).collect()
    }
    assert got == {0: "v1", 1: "v1", 2: "v1", 3: "v1", 4: "v1", 5: "v1", 6: "v2", 7: "v2"}
