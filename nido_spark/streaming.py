"""Structured-Streaming ingestion for the transcript -> edge pipeline.

The reference is strictly batch (no streaming anywhere in nido); this module
is the Spark-native extension for continuously arriving transcripts:

- ``stream_transcripts``   — readStream over a transcript directory (or any
                             source with the same schema).
- ``streaming_turn_counts``— watermarked windowed per-role turn counts
                             (operational monitoring of the ingest).
- ``stateful_transcript_edges`` — per-conversation stateful turn reassembly
                             (``applyInPandasWithState`` keyed by conv_id):
                             emits role-adjacency and conv->tool edge
                             increments with the SAME semantics as the batch
                             derivation even when a conversation is split
                             MID-stream across micro-batches — the state
                             carries the last seen turn per conversation.
- ``incremental_edges``    — foreachBatch loop that maintains a persistent
                             edge table: per micro-batch, MERGE the batch's
                             edge increments into a parquet accumulator.
                             Replay-safe: each fold writes an epoch-unique
                             directory and records the epoch in the pointer,
                             so an at-least-once redelivery of an epoch is a
                             no-op (idempotent), and a fold never overwrites
                             the directory it is reading.

Graph algorithms then run over the accumulated edge table on whatever
cadence the deployment wants; community detection itself is inherently a
batch fixpoint, so the streaming boundary is edge ACCUMULATION, not the
Louvain loop.

Ordering contract: within a conversation, turns must arrive in turn_idx
order ACROSS batches (the natural property of a live append-only feed);
within a batch any order is fine (sorted before processing). State is one
(turn_idx, actor) pair per open conversation — O(open convs), not O(turns);
pass ``watermark`` + ``idle_timeout_s`` to reap idle conversations via
GroupStateTimeout.EventTimeTimeout (state bounded at O(ACTIVE convs)).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nido_spark.io import TRANSCRIPT_SCHEMA, transcript_string_edges


def stream_transcripts(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 16,
    source_format: str = "parquet",
    options: dict[str, str] | None = None,
) -> DataFrame:
    """readStream over the transcripts source, mirroring
    ``io.read_transcripts``'s format contract on the streaming side.

    - ``"parquet"`` (default, the sandbox fixture): schema-pinned file
      stream; ``path`` is the watched directory and ``maxFilesPerTrigger``
      bounds micro-batch size.
    - any other format string goes straight to
      ``spark.readStream.format(...)`` — e.g. ``"kafka"`` with
      ``options={"kafka.bootstrap.servers": ..., "subscribe": ...}``
      (deserialize the value column downstream), ``"rate"``, a Kinesis
      connector, or ``"delta"``/``"iceberg"`` CDC with the catalog conf on
      the session via ``get_spark(extra_conf=...)``. ``path`` is forwarded
      as ``load(path)`` when non-empty, else bare ``load()`` (socket/kafka
      sources configure themselves purely via options).

    ``options`` are forwarded verbatim and the format is always honored —
    no silent fallback (same loud-failure policy as the batch reader)."""
    reader = spark.readStream
    if options:
        reader = reader.options(**options)
    if source_format == "parquet":
        return (
            reader.schema(TRANSCRIPT_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path)
        )
    reader = reader.format(source_format)
    return reader.load(path) if path else reader.load()


def streaming_turn_counts(
    transcripts: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Watermarked per-(window, role) turn counts — late rows beyond the
    watermark are dropped, state is bounded."""
    return (
        transcripts.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "role")
        .agg(F.count(F.lit(1)).alias("n_turns"))
    )


def streaming_session_stats(
    events: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-(key, session) rollup via Spark's NATIVE ``session_window``
    (gap-merged in streaming state, watermark-bounded) — the streaming
    counterpart of relational.session_stats: (key, window_start,
    window_end, n_events, t_start, t_end). Works identically over a batch
    DataFrame (same function, no stream required).

    Boundary note: session_window treats an event exactly ``gap`` after
    the previous as a NEW session (windows are [start, last+gap) and the
    merge needs strict overlap), while relational.sessionize keeps
    ``diff == gap`` in the same session (`> gap` starts a new one). At
    sub-second event resolution exact-gap ties are measure-zero; the
    stream==batch parity test uses tie-free data."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(key), F.session_window(F.col(ts_col), gap).alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("t_start"),
            F.max(ts_col).alias("t_end"),
        )
        .select(
            key,
            F.col("sw.start").alias("window_start"),
            F.col("sw.end").alias("window_end"),
            "n_events",
            "t_start",
            "t_end",
        )
    )


def streaming_dedup(
    rows: DataFrame,
    key_cols: tuple[str, ...] = ("fp",),
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: emit the FIRST arrival of each ``key_cols``
    value and drop any duplicate arriving within the event-time
    ``watermark`` — the streaming counterpart of dedup.exact_dedup for an
    ingest pipeline (dedup the firehose BEFORE it lands, instead of a
    batch pass after). Built on Spark's native
    ``dropDuplicatesWithinWatermark``: per-key state is EVICTED once the
    watermark passes its last-seen time, so state is bounded by the
    duplicate-arrival horizon — not by corpus cardinality, which is what
    makes it safe on an unbounded stream (a plain dropDuplicates would
    accumulate every key forever). Duplicates separated by MORE than the
    watermark are both emitted (the documented horizon contract; chain a
    batch exact_dedup downstream for total dedup). Works on the batch
    path too (falls back to plain dropDuplicates semantics there)."""
    w = rows.withWatermark(ts_col, watermark)
    if rows.isStreaming:
        return w.dropDuplicatesWithinWatermark(list(key_cols))
    return rows.dropDuplicates(list(key_cols))


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "conv_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    upper: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked stream-stream INNER equi-join with an event-time band:
    each left row pairs with the right rows of the same ``key`` whose
    timestamp falls in ``[left_ts, left_ts + upper]`` — the enrichment
    join an ingest pipeline runs between two live feeds (e.g. user turns
    against the tool results that answered them within 5 minutes). Right
    columns (including the key) come back suffixed ``_r`` so the two
    sides never collide whatever their schemas share.

    State is bounded on BOTH sides: Spark's stream-stream join keeps a
    left row only until the right watermark passes ``left_ts + upper``
    and a right row until the left watermark passes ``right_ts`` — the
    band + watermark give the engine the eviction bound an unbanded
    stream-stream join lacks (which would otherwise buffer both streams
    forever). Works identically on batch frames (same function, no
    stream required — the stream==batch parity test's contract); use
    relational.interval_join for the bucketized batch-scale variant."""
    r2 = right.select(
        *[F.col(c).alias(c + "_r") for c in right.columns]
    )
    lw = left.withWatermark(left_ts, watermark)
    rw = r2.withWatermark(right_ts + "_r", watermark)
    cond = (
        (F.col(key) == F.col(key + "_r"))
        & (F.col(right_ts + "_r") >= F.col(left_ts))
        & (
            F.col(right_ts + "_r")
            <= F.col(left_ts) + F.expr(f"INTERVAL {upper}")
        )
    )
    return lw.join(rw, cond, "inner")


# ---------------------------------------------------------------------------
# Stateful cross-batch turn reassembly
# ---------------------------------------------------------------------------

_EDGE_INC_SCHEMA = "a string, b string, w double"
_STATE_SCHEMA = "last_turn integer, last_actor string"


def _actor_name(conv_id: str, role: str, tool) -> str:
    return f"tool:{tool}" if role == "tool" else f"{conv_id}:{role}"


def _make_reassemble(idle_timeout_ms: int | None):
    """Build the per-conversation state function. With ``idle_timeout_ms``
    set (EventTimeTimeout mode), each update arms a timeout at
    max-event-time + horizon; when the watermark passes it the
    conversation's state is REMOVED — long-running deployments no longer
    leak one state row per abandoned conversation. A conversation that
    resumes after its reap restarts cleanly (no boundary adjacency across
    the reap, by definition: the reap declared it closed)."""

    def _reassemble_conv(key, pdfs: Iterable[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        """Per-conversation state function: emit one (a, b, w=1) row per
        role-adjacency (including the adjacency that SPANS the batch
        boundary, via the saved last actor) and per tool invocation
        (conv->tool)."""
        (conv_id,) = key
        if idle_timeout_ms is not None and state.hasTimedOut:
            state.remove()
            yield pd.DataFrame({"a": [], "b": [], "w": []})
            return
        chunks = list(pdfs)
        rows = pd.concat(chunks) if chunks else pd.DataFrame(
            {"conv_id": [], "turn_idx": [], "role": [], "tool": []}
        )
        if len(rows) == 0:
            yield pd.DataFrame({"a": [], "b": [], "w": []})
            return
        rows = rows.sort_values("turn_idx")
        last_turn, last_actor = state.get if state.exists else (None, None)
        a_out, b_out = [], []
        for turn, role, tool in zip(rows["turn_idx"], rows["role"], rows["tool"]):
            if last_turn is not None and int(turn) <= last_turn:
                # replayed/out-of-order turn (violates the in-order contract):
                # drop instead of double-counting its adjacency increments
                continue
            actor = _actor_name(conv_id, role, tool)
            if last_actor is not None:
                a_out.append(min(last_actor, actor))
                b_out.append(max(last_actor, actor))
            if role == "tool":
                a_out.append(f"conv:{conv_id}")
                b_out.append(f"tool:{tool}")
            last_turn, last_actor = int(turn), actor
        state.update((last_turn, last_actor))
        if idle_timeout_ms is not None:
            # arm the reap at max event time + horizon; must stay strictly
            # ahead of the current watermark or Spark rejects the timestamp
            ts_max_ms = int(rows["ts"].max().value // 1_000_000)
            state.setTimeoutTimestamp(
                max(ts_max_ms + idle_timeout_ms, state.getCurrentWatermarkMs() + 1)
            )
        yield pd.DataFrame({"a": a_out, "b": b_out, "w": [1.0] * len(a_out)})

    return _reassemble_conv


def stateful_transcript_edges(
    transcripts_stream: DataFrame,
    watermark: str | None = None,
    idle_timeout_s: int = 0,
) -> DataFrame:
    """Streaming edge INCREMENTS (a, b, w) with exact batch parity: a
    conversation split mid-stream still yields the boundary adjacency,
    because the last (turn_idx, actor) per conv_id is carried in group
    state. Aggregate increments downstream (the accumulator store does).

    With ``watermark`` (e.g. ``"10 minutes"``) and ``idle_timeout_s`` set,
    state runs under ``GroupStateTimeout.EventTimeTimeout``: a conversation
    idle past the horizon is reaped once the watermark passes, bounding
    state at O(ACTIVE conversations) instead of O(all conversations ever).
    Default (no watermark) keeps NoTimeout for sealed/synthetic replays
    where every conversation completes."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    if watermark is not None:
        if idle_timeout_s <= 0:
            raise ValueError("watermark requires a positive idle_timeout_s")
        return (
            transcripts_stream.withWatermark("ts", watermark)
            .select("conv_id", "turn_idx", "role", "tool", "ts")
            .groupBy("conv_id")
            .applyInPandasWithState(
                _make_reassemble(idle_timeout_s * 1000),
                outputStructType=_EDGE_INC_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            )
        )
    return (
        transcripts_stream.select("conv_id", "turn_idx", "role", "tool")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _make_reassemble(None),
            outputStructType=_EDGE_INC_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Persistent accumulator
# ---------------------------------------------------------------------------


class IncrementalEdgeStore:
    """foreachBatch sink that folds each micro-batch's (a, b, w) edge
    increments into a persistent accumulator.

    Parquet rendering: read current + union + re-aggregate + write to an
    EPOCH-UNIQUE directory, then atomically flip a pointer file that records
    both the directory and the epoch. Replay-safe under foreachBatch's
    at-least-once contract: (1) an epoch <= the recorded one is a no-op, so
    a crash between pointer flip and streaming-checkpoint commit cannot
    double-count; (2) the fold never writes the directory it reads. With
    Delta/Iceberg jars this collapses to ``MERGE INTO`` with the epoch
    recorded in the table's commit metadata — same contract, kept behind
    this class so the pipeline code does not change.
    """

    def __init__(self, spark: SparkSession, root: str, keep_history: int = 2):
        self.spark = spark
        self.root = root
        self.keep_history = max(keep_history, 1)
        os.makedirs(root, exist_ok=True)

    def _pointer(self) -> dict | None:
        p = os.path.join(self.root, "CURRENT")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            raw = f.read().strip()
        try:
            return json.loads(raw)
        except json.JSONDecodeError:  # legacy slot-name pointer
            return {"dir": raw, "epoch": -1}

    def last_epoch(self) -> int:
        ptr = self._pointer()
        return -1 if ptr is None else int(ptr.get("epoch", -1))

    def current(self) -> DataFrame | None:
        ptr = self._pointer()
        if ptr is None:
            return None
        return self.spark.read.parquet(os.path.join(self.root, ptr["dir"]))

    def _commit(self, merged: DataFrame, epoch_id: int) -> None:
        out_dir = f"epoch_{int(epoch_id):012d}"
        merged.write.mode("overwrite").parquet(os.path.join(self.root, out_dir))
        tmp = os.path.join(self.root, "CURRENT.tmp")
        with open(tmp, "w") as f:
            f.write(json.dumps({"dir": out_dir, "epoch": int(epoch_id)}))
        os.replace(tmp, os.path.join(self.root, "CURRENT"))
        self._gc(out_dir)

    def _gc(self, current_dir: str) -> None:
        epochs = sorted(
            d for d in os.listdir(self.root)
            if d.startswith("epoch_") and d != current_dir
        )
        for d in epochs[: max(0, len(epochs) - (self.keep_history - 1))]:
            import shutil

            shutil.rmtree(os.path.join(self.root, d), ignore_errors=True)

    def _replayed(self, epoch_id: int) -> bool:
        """True when the epoch was already folded (at-least-once replay).

        foreachBatch epoch ids restart at 0 under a FRESH streaming
        checkpoint; silently skipping them would make a stream that appears
        healthy while folding nothing (the checkpoint-deleted-but-store-kept
        footgun). Within one run, a replay can only be of the LAST committed
        epoch, so epoch 0 arriving when epochs >= 1 are committed can only
        mean a new run — and folding a from-scratch replay into an
        accumulator that already contains the data would double-count, so
        the only safe remedy is a fresh store root. Raise with that."""
        last = self.last_epoch()
        if int(epoch_id) == 0 and last >= 1:
            raise RuntimeError(
                f"IncrementalEdgeStore at {self.root}: received epoch 0 but "
                f"epoch {last} is already committed — this is a NEW streaming "
                f"run (fresh checkpoint) over an existing accumulator. The "
                f"new run will replay its source from scratch; folding it "
                f"here would double-count. Point the query at a fresh store "
                f"root (or keep the original checkpoint to resume)."
            )
        return int(epoch_id) <= last

    def fold_edge_increments(self, batch_edges: DataFrame, epoch_id: int) -> None:
        """foreachBatch callback for a stream of (a, b, w) increments
        (e.g. stateful_transcript_edges output)."""
        if self._replayed(epoch_id):
            return  # at-least-once replay of an already-folded epoch: no-op
        cur = self.current()
        agg = batch_edges.groupBy("a", "b").agg(F.sum("w").alias("w"))
        merged = agg if cur is None else (
            cur.unionByName(agg).groupBy("a", "b").agg(F.sum("w").alias("w"))
        )
        self._commit(merged, epoch_id)

    def fold_batch(self, batch_transcripts: DataFrame, epoch_id: int) -> None:
        """foreachBatch callback for a raw transcript stream; derives the
        batch's edges first (sealed-conversation contract — use
        stateful_transcript_edges + fold_edge_increments for live
        mid-conversation streams)."""
        if self._replayed(epoch_id):
            return
        self.fold_edge_increments(transcript_string_edges(batch_transcripts), epoch_id)


def incremental_edges(
    transcripts_stream: DataFrame, store: IncrementalEdgeStore, checkpoint_dir: str
):
    """Start the accumulation query over sealed-conversation drops; caller
    owns lifecycle (stop/await)."""
    return (
        transcripts_stream.writeStream.foreachBatch(store.fold_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def incremental_edges_stateful(
    transcripts_stream: DataFrame,
    store: IncrementalEdgeStore,
    checkpoint_dir: str,
    watermark: str | None = None,
    idle_timeout_s: int = 0,
):
    """Start the accumulation query with cross-batch turn reassembly —
    exact batch parity even when conversations split across micro-batches.
    Pass ``watermark`` + ``idle_timeout_s`` to reap idle-conversation state
    (see stateful_transcript_edges)."""
    increments = stateful_transcript_edges(
        transcripts_stream, watermark=watermark, idle_timeout_s=idle_timeout_s
    )
    return (
        increments.writeStream.foreachBatch(store.fold_edge_increments)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


_CHAIN_INC_SCHEMA = "conv_id string, t1 string, t2 string, w long"
_CHAIN_STATE_SCHEMA = "last_turn integer, last_tool string"


def _chain_conv(key, pdfs: Iterable[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    """Per-conversation state function for tool-chain mining: the input is
    pre-filtered to tool turns; the last (turn_idx, tool) is carried in
    group state so a chain spanning a micro-batch boundary still yields its
    bigram (same boundary-carry contract as _make_reassemble). Out-of-order
    or replayed turns (turn_idx <= last seen) are dropped, not
    double-counted."""
    (conv_id,) = key
    chunks = list(pdfs)
    rows = pd.concat(chunks) if chunks else pd.DataFrame(
        {"conv_id": [], "turn_idx": [], "tool": []}
    )
    empty = pd.DataFrame({"conv_id": [], "t1": [], "t2": [], "w": []}).astype(
        {"conv_id": "string", "t1": "string", "t2": "string", "w": "int64"}
    )
    if len(rows) == 0:
        yield empty
        return
    rows = rows.sort_values("turn_idx")
    last_turn, last_tool = state.get if state.exists else (None, None)
    t1_out, t2_out = [], []
    for turn, tool in zip(rows["turn_idx"], rows["tool"]):
        if last_turn is not None and int(turn) <= last_turn:
            continue
        if last_tool is not None:
            t1_out.append(last_tool)
            t2_out.append(tool)
        last_turn, last_tool = int(turn), tool
    state.update((last_turn, last_tool))
    yield pd.DataFrame(
        {
            "conv_id": [conv_id] * len(t1_out),
            "t1": t1_out,
            "t2": t2_out,
            "w": [1] * len(t1_out),
        }
    )


def stateful_tool_chains(transcripts_stream: DataFrame) -> DataFrame:
    """Streaming tool-chain bigram INCREMENTS (conv_id, t1, t2, w=1) with
    exact batch parity against conversation.tool_chains: the stream is
    filtered to tool turns BEFORE keying (so state is O(1) per conversation
    — just the last tool call), and the boundary bigram of a conversation
    split across micro-batches is emitted from carried state. Aggregate
    downstream: SUM(w) per (t1, t2) reproduces tool_chains.n exactly and
    COUNT(DISTINCT conv_id) reproduces n_convs (the increments carry
    conv_id precisely so distinct-conv attribution survives streaming)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        transcripts_stream.where(F.col("tool").isNotNull())
        .select("conv_id", "turn_idx", "tool")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _chain_conv,
            outputStructType=_CHAIN_INC_SCHEMA,
            stateStructType=_CHAIN_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
