"""The userstream-bridge dataflow and stateful streaming operators.

This module re-expresses the reference's entire event path (SURVEY §2.1
R1-R12, §3.1) as one declarative Structured Streaming pipeline plus reusable
stateful operators. The reference's checkout is empty (SURVEY §0.1), so the
shape follows SURVEY's reconstruction: ingest → JSON decode → event-type
dispatch → per-subscriber filter → legacy-payload reshape → redelivery dedup
→ fan-out, with keep-alive/backpressure as trigger/source options.

Scale: every stage is a narrow transformation except the stream-static
subscription join (broadcast — subscriptions are the small side) and the
stateful dedup (state partitioned by event_id hash, bounded by watermark).
"""

from __future__ import annotations

from typing import Callable, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: R2 — the wire schema of a raw JSON event line. ``ts`` is TIMESTAMP_NTZ to
#: match the batch fixture tables (the events parquet stores
#: isAdjustedToUTC=false micros, which Spark reads as NTZ), so decoded
#: streams union/join with batch tables without an implicit type coercion.
WIRE_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def as_event_time(df: DataFrame, *cols: str) -> DataFrame:
    """Cast NTZ timestamp columns to TIMESTAMP (LTZ) at the watermark
    boundary.

    Spark Structured Streaming hard-requires event-time columns to be
    TIMESTAMP (``EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE`` otherwise), while the
    engine's wire/batch schema is TIMESTAMP_NTZ. The session time zone is
    pinned to UTC (session.py), so this cast relabels the same instant —
    values are bit-identical. Pipelines cast back to NTZ on their output
    columns so stream results schema-match their batch analogs.
    """
    out = df
    for c in cols or ("ts",):
        out = out.withColumn(c, F.col(c).cast("timestamp"))
    return out


def decode_events(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """R2 — bytes/strings → typed columns via from_json with an explicit
    schema (never inferSchema on a stream)."""
    return raw.select(
        F.from_json(F.col(value_col).cast("string"), WIRE_SCHEMA).alias("e")
    ).select("e.*")


def bridge_pipeline(
    events: DataFrame,
    subscriptions: DataFrame,
    watermark: str = "10 minutes",
) -> DataFrame:
    """R3-R6 + R10: dispatch, subscription filter, legacy reshape, dedup.

    ``subscriptions`` is a static (user_id, client_id) DataFrame — the
    stream-static join (I6) is broadcast. Delete events become tombstone
    records (R10) instead of being dropped. Output is the legacy-shaped
    NDJSON payload column plus routing keys.
    """
    routed = (
        as_event_time(events).withWatermark("ts", watermark)
        # R6 — redelivery dedup, state bounded by the watermark.
        .dropDuplicatesWithinWatermark(["event_id"])
        # R3 — event-type dispatch: keep the service event kinds, tag class.
        .withColumn(
            "kind",
            F.when(F.col("event_type") == "error", "tombstone").otherwise("event"),
        )
        # R4 — only events for subscribed users (broadcast stream-static join).
        .join(F.broadcast(subscriptions), "user_id")
    )
    # R5 — reshape into the legacy payload format.
    return routed.select(
        "client_id",
        "user_id",
        "kind",
        F.to_json(
            F.struct(
                F.col("event_id").alias("id"),
                F.col("event_type").alias("event"),
                F.col("ts").cast("string").alias("created_at"),
                F.col("value").alias("amount"),
                F.col("props").alias("meta"),
            )
        ).alias("payload"),
        F.col("ts").cast("timestamp_ntz").alias("ts"),
    )


def fanout_foreach_batch(
    sinks: dict[str, list],
) -> Callable[[DataFrame, int], None]:
    """R9 (test double) — one ingest query demuxed to N per-client buffers
    via foreachBatch. ``sinks`` maps client_id → list collecting payloads.

    This variant collects every micro-batch to the driver so tests can
    assert on in-memory buffers; it is NOT the scale path — at production
    volume the driver would serialize every event. The deployable form is
    :func:`fanout_foreach_partition`, which keeps payloads on the
    executors."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        for row in batch.orderBy("ts", "payload").collect():  # R11 ordering
            sinks.setdefault(row.client_id, []).append(row.payload)

    return handle


def _write_fanout_chunks(base_dir: str, batch_id: int):
    """Executor-side per-client writer for one micro-batch partition,
    Arrow-batched: payloads arrive as pandas chunks (no per-row Python), and
    each client's lines are joined and written in one call. Stands in for
    the reference's per-connection socket writers — a real deployment opens
    one connection per client here (connection pool per executor) instead
    of a per-batch file. Module-level so the closure sent to ``mapInPandas``
    pickles without dragging the DataFrame along."""

    def write(chunks) -> Iterable[pd.DataFrame]:
        import os
        import uuid

        # Each (client, batch) file is written to an attempt-unique temp
        # name and os.replace()d into place only on clean close: replace is
        # atomic, so duplicate attempts of the same task (speculative
        # execution, zombie tasks after a driver-perceived failure) can
        # never interleave partial lines in the final file — last writer
        # wins with a complete copy, and a crashed attempt leaves only an
        # orphan .tmp. Plain truncate-then-write ("w" on the final name)
        # is idempotent for sequential replays but not for concurrent ones.
        writers: dict[str, tuple[object, str, str]] = {}
        n = 0
        ok = False
        try:
            for pdf in chunks:  # chunk order == sorted partition order
                # groupby(sort=False) keeps within-group row order, so ts
                # ordering from sortWithinPartitions survives.
                for client, grp in pdf.groupby("client_id", sort=False):
                    entry = writers.get(client)
                    if entry is None:
                        d = os.path.join(base_dir, f"client_id={client}")
                        os.makedirs(d, exist_ok=True)
                        final = os.path.join(d, f"batch-{batch_id:09d}.ndjson")
                        tmp = f"{final}.tmp-{uuid.uuid4().hex}"
                        entry = (open(tmp, "w", encoding="utf-8"), tmp, final)
                        writers[client] = entry
                    entry[0].write("\n".join(grp["payload"]) + "\n")
                    n += len(grp)
            ok = True
        finally:
            # Per-entry isolation: one writer's close/replace/unlink failing
            # must not skip cleanup (leaked handles, orphaned .tmp, partial
            # publish) for the remaining entries — finish them all, then
            # re-raise the first error so the task attempt still fails.
            first_err: BaseException | None = None
            for w, tmp, final in writers.values():
                try:
                    w.close()
                    if ok:
                        os.replace(tmp, final)
                    else:
                        os.unlink(tmp)
                except BaseException as exc:
                    if first_err is None:
                        first_err = exc
            if first_err is not None:
                raise first_err
        yield pd.DataFrame({"n_written": [n]})

    return write


def fanout_foreach_partition(base_dir: str) -> Callable[[DataFrame, int], None]:
    """R9 at scale — demux a micro-batch to per-client streams WITHOUT the
    driver touching a single payload.

    ``repartition(client_id)`` routes each client's rows to exactly one
    task (hash partitioning; several clients may share a task, handled by
    the per-partition writer map), ``sortWithinPartitions`` restores R11
    per-client ordering inside the batch, and an Arrow-batched
    ``mapInPandas`` writer runs on the executors. The driver only
    coordinates micro-batches and collects one count row per partition, so
    fan-out bandwidth scales with the executor count — the collect-based
    double above is O(stream) on one node. Each (client, batch) produces
    one atomically-replaced file named by batch id, so concatenating a
    client's files in name order replays its stream in delivery order."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        (
            batch.repartition("client_id")
            .sortWithinPartitions("client_id", "ts", "payload")
            .select("client_id", "payload")
            .mapInPandas(_write_fanout_chunks(base_dir, batch_id), "n_written long")
            .collect()
        )

    return handle


def windowed_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """I1+I4 — watermarked tumbling-window aggregation (streaming form of
    q_window_tumbling); late rows beyond the watermark are dropped."""
    return (
        as_event_time(events).withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("bucket_ts"),
            "n_events",
        )
    )


def running_user_counters(events: DataFrame) -> DataFrame:
    """I8 — arbitrary keyed state via applyInPandasWithState: per-user
    running event count + value sum (the reference's per-connection state
    R6/R7 analog). State lives in the state store, keyed by user_id."""

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, sum_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )



def running_ewma(events: DataFrame, alpha: float = 0.25) -> DataFrame:
    """I8/X65 — streaming EWMA: the batch HOF fold (`q_ewma`,
    operators/scale_ops.py) run incrementally. The state store holds one
    (ewma, n) pair per key; each micro-batch sorts its rows into
    (ts, event_id) order and continues the fold from the carried value —
    the same IEEE op sequence as the batch `aggregate(...)`, so over an
    in-order replay the final streamed value equals the batch result
    bit-for-bit (asserted in tests). This is the batch/stream duality the
    engine aims for: one smoothing definition, two execution modes, state
    bounded at one double per key."""

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            cur, n = state.get
            has = True
        else:
            cur, n, has = 0.0, 0, False
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            batch = batch.sort_values(["ts", "event_id"])
            for v in batch["value"]:
                if not has:
                    cur, has = float(v), True
                else:
                    cur = alpha * float(v) + (1.0 - alpha) * cur
                n += 1
        state.update((cur, n))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "ewma": [cur]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, ewma double",
        stateStructType="ewma double, n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def user_counters_tws(events: DataFrame) -> DataFrame:
    """I8 (Spark-4 form) — the same per-user running counters as
    running_user_counters, on the transformWithState API: typed ValueState
    per key, incremental per micro-batch. Requires the RocksDB state store
    provider (the API's only supported backend — also the engine's 100 TB
    default). Prefer this form going forward: fine-grained state types
    (value/list/map), timers, and TTL without re-shipping the whole state
    tuple per batch. Runtime needs google.protobuf (Spark's state-server
    protocol); the test gates on it — absent in this container."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserCounter(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("counts", "n long, total double")

        def handleInputRows(self, key, rows, timerValues):
            n, total = 0, 0.0
            if self._state.exists():
                n, total = self._state.get()
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "sum_value": [total]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        UserCounter(),
        outputStructType="user_id long, n_events long, sum_value double",
        outputMode="Update",
        timeMode="None",
    )


def session_counts(events: DataFrame, gap: str = "30 minutes",
                   watermark: str = "10 minutes") -> DataFrame:
    """I3 streaming form — watermarked session-window aggregation per user:
    the state store *merges* adjacent session windows as events arrive
    (unlike fixed windows, a session's bounds move), and the watermark both
    finalizes sessions and bounds state."""
    return (
        as_event_time(events).withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").cast("timestamp_ntz").alias("session_start"),
            "user_id",
            "n_events",
        )
    )


def curation_stream(
    events: DataFrame,
    watermark: str = "10 minutes",
    min_payload_chars: int = 1,
) -> DataFrame:
    """Streaming corpus curation — the batch X85/X95 passes composed onto
    the event stream: watermarked redelivery dedup, PII scrub of the
    payload column (same RE2∩Java regexes as `q_pii_scrub`, so batch and
    stream scrub identically), and a minimal quality gate. Everything
    after the dedup is a narrow per-row transform, so the stage runs at
    source parallelism on any cluster; output `ts` is cast back to NTZ to
    schema-match the batch tables (see `as_event_time`)."""
    from twitter_event_stream_spark.operators.curation_extra import (
        _EMAIL,
        _IPV4,
        _PHONE,
    )

    # NULL-safe: a NULL payload normalizes to '' BEFORE scrub/gate, so the
    # quality gate decides its fate (min_payload_chars=0 keeps it) instead
    # of a three-valued NULL >= n predicate silently dropping it.
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.coalesce(F.col("props"), F.lit("")), _EMAIL, "<EMAIL>"
            ),
            _IPV4,
            "<IP>",
        ),
        _PHONE,
        "<PHONE>",
    )
    return (
        as_event_time(events)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
        .withColumn("props", scrubbed)
        .filter(F.length("props") >= min_payload_chars)
        .withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    )


def dedup_ingest_batch(
    index_path: str,
    out_dir: str,
    max_hamming: int = 3,
) -> Callable[[DataFrame, int], None]:
    """Per-micro-batch body of :func:`dedup_ingest_stream`, factored to
    module level (like ``fanout_foreach_partition``) so the crash-replay
    contract is directly testable: calling the handler twice with the same
    (batch, batch_id) — the at-least-once retry after a crash between the
    index append and the checkpoint commit — must republish the identical
    survivor set.

    Per batch, exactly once per document ever, the 64-bit SimHash
    signature is computed and exploded into band rows; those SAME rows
    then feed all three uses (r8 ADVICE — no recompute):

    1. **Intra-batch gate** — banded self-join of the batch against
       itself: a doc is suppressed when some batch peer with a SMALLER
       doc_id is within ``max_hamming``. Deterministic and batch-order
       free; the published survivors of one batch are pairwise more than
       ``max_hamming`` apart (banded recall is pigeonhole-exact, so a
       surviving pair at <= max_hamming would have been a candidate).
       This is deliberately a pairwise gate, not connected-components
       canonicalization: it mirrors what ``dedup_against_index`` does with
       the index side (is ANY already-accepted doc near me?), with
       "already accepted" = smaller-id peers of the same batch.
    2. **Index gate** — broadcast band join against the persisted index
       via ``dedup_against_index(band_rows=...)``; self-identity matches
       (a replayed batch finding its own appended rows) are excluded
       there, which is what closes the replay window.
    3. **Index append** — the survivors' band rows append via
       ``write_band_rows``; no re-tokenize, no re-vote.

    Replay safety: the corpus sink overwrites ``out_dir/batch=<id>`` (a
    replay republishes the same files); the index append is absorbed by
    the min-(hamming, doc_id) verdict (duplicate band rows only duplicate
    join candidates) plus the self-identity filter (a doc's own appended
    rows never gate it). Pinned by tests/test_streaming.py's replay test.
    """
    from twitter_event_stream_spark.operators.corpus_full import (
        _simhash_band_rows,
        dedup_against_index,
        simhash64,
        write_band_rows,
    )

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df.persist()
        rows = _simhash_band_rows(simhash64(batch_df))
        rows.persist()
        try:
            lft = rows.select(
                F.col("doc_id").alias("n_id"),
                F.col("sig").alias("n_sig"),
                "band",
                "val",
            )
            rgt = rows.select(
                F.col("doc_id").alias("c_id"),
                F.col("sig").alias("c_sig"),
                "band",
                "val",
            )
            suppressed = (
                lft.join(F.broadcast(rgt), ["band", "val"])
                .filter(F.col("c_id") < F.col("n_id"))
                .filter(
                    F.bit_count(F.col("n_sig").bitwiseXOR(F.col("c_sig")))
                    <= max_hamming
                )
                .select(F.col("n_id").alias("doc_id"))
                .distinct()
            )
            verdicts = dedup_against_index(
                spark, batch_df, index_path, max_hamming, band_rows=rows
            )
            uniq_ids = (
                verdicts.filter(F.col("dup_of").isNull())
                .select("doc_id")
                .join(suppressed, "doc_id", "left_anti")
            )
            uniq = batch_df.join(uniq_ids, "doc_id")
            uniq.persist()
            try:
                uniq.write.mode("overwrite").parquet(
                    f"{out_dir}/batch={batch_id}"
                )
                write_band_rows(
                    rows.join(uniq_ids, "doc_id"), index_path, mode="append"
                )
            finally:
                uniq.unpersist()
        finally:
            rows.unpersist()
            batch_df.unpersist()

    return _ingest


def dedup_ingest_stream(
    docs_stream: DataFrame,
    index_path: str,
    out_dir: str,
    checkpoint: str,
    max_hamming: int = 3,
):
    """Streaming corpus ingestion gated by the persisted incremental dedup
    index (X115 composed onto Structured Streaming): every micro-batch of
    incoming documents is first deduped WITHIN the batch (smallest doc_id
    survives among mutual near-dups), then against the index; only the
    surviving unique docs are published to the corpus sink, and their band
    keys are appended to the index — so later micro-batches AND later
    streaming runs see everything ingested before them. This is the
    ingest-time near-dup gate a training-corpus pipeline runs
    continuously; signatures are computed once per document ever (the
    index carries the corpus's, the batch's feed gate and append alike)
    and the per-batch work is the broadcast band joins of
    :func:`dedup_ingest_batch`, where the per-batch semantics — including
    crash-replay safety — are documented and pinned.

    Returns the started query (caller awaits termination); drain with
    ``trigger(availableNow=True)`` semantics — the trigger is set here.
    """
    return (
        docs_stream.writeStream.foreachBatch(
            dedup_ingest_batch(index_path, out_dir, max_hamming)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
