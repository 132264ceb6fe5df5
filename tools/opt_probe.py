#!/usr/bin/env python
"""Optimization-round measurement probe (guide §1).

Times every registered query at $SPARK_GRAFT_SF_DIR with the noop sink
(`df.write.format("noop")` — computes every column of every row, no sink
cost, guide §1.4) and dumps `.explain("formatted")` for each into
--plans-dir. Jobs are labelled (guide §1.5). This is a MEASUREMENT tool
only: it never feeds results back into any query path and nothing here is
on the bench or driver surface.

Usage:
    python tools/opt_probe.py [--queries q_a,q_b] [--runs 3]
        [--plans-dir plans/r16/probe] [--out /tmp/probe.json]

Per query it reports cold (run 1) and warm (median of runs 2..n) seconds
plus plan-shape counters greppable for the usual suspects: Exchange count,
join strategies, BatchEvalPython/ArrowEvalPython nodes, CartesianProduct.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from twitter_event_stream_spark import registry  # noqa: E402
from twitter_event_stream_spark.session import get_spark  # noqa: E402
from twitter_event_stream_spark.tables import load_tables  # noqa: E402


def formatted_plan(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


PLAN_COUNTERS = {
    "exchanges": r"\bExchange\b",
    "broadcast_exchanges": r"\bBroadcastExchange\b",
    "sort_merge_joins": r"\bSortMergeJoin\b",
    "broadcast_hash_joins": r"\bBroadcastHashJoin\b",
    "shuffled_hash_joins": r"\bShuffledHashJoin\b",
    "nested_loop_joins": r"\bBroadcastNestedLoopJoin\b",
    "cartesian": r"\bCartesianProduct\b",
    "batch_eval_python": r"\bBatchEvalPython\b",
    "arrow_eval_python": r"\bArrowEvalPython\b",
    "map_in_arrow_or_pandas": r"\bMapInPandas\b|\bPythonMapInArrow\b|\bMapInArrow\b",
    "sorts": r"\bSort\b",
    "window_ops": r"\bWindow\b",
    "scans": r"Scan parquet|FileScan",
}


def plan_shape(plan: str) -> dict:
    return {k: len(re.findall(rx, plan)) for k, rx in PLAN_COUNTERS.items()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None, help="comma list; default all")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--no-time", action="store_true", help="plans only")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="tes-opt-probe")
    load_tables(spark, sf_dir)

    names = (
        args.queries.split(",")
        if args.queries
        else sorted(registry.all_queries().keys())
    )
    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)

    results: dict[str, dict] = {}
    for name in names:
        fn = registry.get(name).fn
        spark.sparkContext.setJobDescription(f"opt-probe: {name}")
        try:
            df = fn(spark, sf_dir)
            plan = formatted_plan(spark, df)
            if args.plans_dir:
                with open(
                    os.path.join(args.plans_dir, f"{name}.txt"), "w"
                ) as f:
                    f.write(plan)
            rec: dict = {"shape": plan_shape(plan)}
            if not args.no_time:
                times = []
                for _ in range(args.runs):
                    # Time construction + action TOGETHER (like the bench's
                    # fn().collect()): several queries run eager work at
                    # construction (localCheckpoint materialization, CC's
                    # bounded collect, quantizer training), and timing only
                    # the sink action would let an optimization "win" by
                    # merely shifting work into the untimed region. Fresh
                    # DataFrame per run so nothing amortizes across runs
                    # (session-level graph caches still amortize, as they
                    # do across bench attempts — read cold for those).
                    t = time.perf_counter()
                    fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    times.append(time.perf_counter() - t)
                rec["cold"] = round(times[0], 3)
                rec["warm"] = round(
                    statistics.median(times[1:]) if len(times) > 1 else times[0], 3
                )
            results[name] = rec
            if not args.no_time:
                print(
                    f"{rec.get('warm', 0):8.3f}s warm {rec.get('cold', 0):8.3f}s cold  {name}",
                    flush=True,
                )
        except Exception as e:  # keep probing; record the failure
            results[name] = {"error": f"{type(e).__name__}: {e}"}
            print(f"ERROR {name}: {type(e).__name__}: {e}", flush=True)
        finally:
            spark.sparkContext.setJobDescription(None)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
    errs = {k: v for k, v in results.items() if "error" in v}
    print(f"probed {len(results)} queries, {len(errs)} errors")
    if errs:
        for k, v in errs.items():
            print(" ", k, v["error"])
        sys.exit(1)


if __name__ == "__main__":
    main()
