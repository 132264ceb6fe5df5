"""SparkSession factory — pins the engine session conventions (SURVEY §2.0 C1).

Conventions pinned here (and re-pinned at runtime by ``configure_session`` so
they hold even on a session the driver created for us):

- ``spark.sql.session.timeZone=UTC`` — DuckDB TIMESTAMP is naive; with UTC
  pinned both engines yield identical naive datetimes (SURVEY §1.3(2)).
- ``spark.sql.legacy.parquet.nanosAsLong=true`` — dormant fallback: current
  fixtures store timestamps as µs NTZ (read natively), but a ns-typed
  testdata regeneration would need this conf (SURVEY §1.3(1)); harmless
  for µs data, and the loader's ns normalization guard never fires.
- AQE on (coalesce partitions, skew-join split) — the 100 TB posture relies on
  runtime re-planning at shuffle boundaries (SURVEY §4.2).

Scale posture: shuffle partitions default to the core count locally; on a real
cluster this is expected to be overridden (e.g. 2-3x total cores, or left to
AQE's coalescing with a high initial partition number).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime-settable SQL confs every engine entry point re-applies.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # parallelismFirst=true (the default) keeps reducer count at the
    # cluster parallelism even for KB-sized shuffles — pure tiny-task
    # scheduler overhead locally, and a tiny-task storm at 100 TB where
    # thousands of reducers each read a few KB. false lets AQE coalesce to
    # the advisory partition size, which is what the advisory knob is for
    # (measured: -23% on the bench query set at sf0.1).
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Let rank<=k filters compile to WindowGroupLimit for budget-scale k
    # (default threshold 1000 blocks e.g. q_mix_sample's prune bound of
    # budget/min_tokens ~= 2k). The rank-limit operator streams over sorted
    # input counting rows per group — O(1) memory — so a large k is safe,
    # and the map-side Partial group limit is the skew/volume defense.
    "spark.sql.optimizer.windowGroupLimitThreshold": "1048576",
    # Arrow for every pandas-UDF / toPandas boundary (SURVEY §3.2 step 6).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime-settable conventions to an existing session.

    Idempotent and cheap; called by the table loader so that driver-owned
    sessions (``__spark_entry__.entry``/``queries`` callables) are configured
    without us controlling builder-time confs.
    """
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # Non-settable in this context (e.g. static conf on a locked
            # session) — the engine still works, parity may need the conf.
            pass
    # Local mode with Spark's untouched 200-partition default: clamp shuffle
    # partitions to the core count (the BASELINE.md config). 200 tasks per
    # tiny local shuffle is pure scheduler overhead; AQE coalesces *after*
    # the shuffle but the initial partitioning still costs. On a cluster
    # (non-local master) the engine never overrides the deployment's choice.
    try:
        if spark.conf.get("spark.master", "").startswith("local") and (
            spark.conf.get("spark.sql.shuffle.partitions") == "200"
        ):
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(spark.sparkContext.defaultParallelism),
            )
    except Exception:
        pass
    return spark


def get_spark(
    app_name: str = "twitter-event-stream-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession with the engine conventions.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or all cores. Local mode is a
    single JVM with N executor threads; the partitioning discipline in the
    operators is what makes the same plans hold on a multi-executor cluster.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 0)) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    if extra_confs:
        for key, value in extra_confs.items():
            builder = builder.config(key, value)
    return configure_session(builder.getOrCreate())
