from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nido_spark import streaming as ST
from nido_spark.graph import normalize_edges, validate_edges
from nido_spark.io import assign_vertex_ids, synth_transcripts, transcript_string_edges


@pytest.fixture()
def transcript_dir(spark, tmp_path):
    path = str(tmp_path / "transcripts")
    # two "arrival waves" as separate files
    synth_transcripts(spark, 60, seed=42).where(
        F.col("conv_id") < "conv_00000030"
    ).coalesce(1).write.mode("overwrite").parquet(path + "/wave1")
    synth_transcripts(spark, 60, seed=42).where(
        F.col("conv_id") >= "conv_00000030"
    ).coalesce(1).write.mode("overwrite").parquet(path + "/wave2")
    return path


def test_streaming_interval_join_stream_batch_parity(spark, tmp_path):
    """Stream-stream band join == the same function on the batch frames:
    user turns enriched with the assistant turns that answered them
    within 5 minutes, delivered across interleaved file waves (each side
    split across two files, maxFilesPerTrigger=1 forces multi-epoch
    buffering on both sides)."""
    tr = synth_transcripts(spark, 80, seed=7)
    users = tr.where(F.col("role") == "user").select("conv_id", "turn_idx", "ts")
    asst = tr.where(F.col("role") == "assistant").select(
        "conv_id", "turn_idx", "ts"
    )
    upath, apath = str(tmp_path / "users"), str(tmp_path / "asst")
    for df, path in ((users, upath), (asst, apath)):
        df.where(F.col("turn_idx") % 2 == 0).coalesce(1).write.parquet(path + "/w1")
        df.where(F.col("turn_idx") % 2 == 1).coalesce(1).write.parquet(path + "/w2")
    schema = "conv_id string, turn_idx int, ts timestamp"
    lstream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(upath + "/w*")
    )
    rstream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(apath + "/w*")
    )
    joined = ST.streaming_interval_join(
        lstream, rstream, key="conv_id", upper="5 minutes"
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory").queryName("ivj")
        .option("checkpointLocation", str(tmp_path / "ck_ivj"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            (r["conv_id"], r["turn_idx"], r["turn_idx_r"])
            for r in spark.sql(
                "SELECT conv_id, turn_idx, turn_idx_r FROM ivj"
            ).collect()
        )
    finally:
        q.stop()
    want = sorted(
        (r["conv_id"], r["turn_idx"], r["turn_idx_r"])
        for r in ST.streaming_interval_join(
            users, asst, key="conv_id", upper="5 minutes"
        ).collect()
    )
    assert got == want and len(want) > 0
    # band semantics: every pair's answer really is within [0, 5m]
    deltas = ST.streaming_interval_join(
        users, asst, key="conv_id", upper="5 minutes"
    ).select(
        (F.unix_micros("ts_r") - F.unix_micros("ts")).alias("d")
    ).collect()
    assert all(0 <= r["d"] <= 300_000_000 for r in deltas)


def test_streaming_turn_counts(spark, transcript_dir, tmp_path):
    stream = ST.stream_transcripts(spark, transcript_dir + "/wave*")
    agg = ST.streaming_turn_counts(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("turns")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql("SELECT role, SUM(n_turns) AS n FROM turns GROUP BY role").collect()
        got = {r["role"]: r["n"] for r in out}
    finally:
        q.stop()
    batch = synth_transcripts(spark, 60, seed=42)
    want = {r["role"]: r["cnt"] for r in batch.groupBy("role").agg(F.count("*").alias("cnt")).collect()}
    assert got == want


def test_incremental_edges_match_batch(spark, transcript_dir, tmp_path):
    store = ST.IncrementalEdgeStore(spark, str(tmp_path / "edges"))
    stream = ST.stream_transcripts(spark, transcript_dir + "/wave*", max_files_per_trigger=1)
    q = ST.incremental_edges(stream, store, str(tmp_path / "ck2"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    acc = {(r["a"], r["b"]): r["w"] for r in store.current().collect()}
    batch = transcript_string_edges(synth_transcripts(spark, 60, seed=42))
    want = {(r["a"], r["b"]): r["w"] for r in batch.collect()}
    # conv-scoped edges are identical; the accumulated table must equal the
    # batch derivation over the full corpus (micro-batching is invisible)
    assert acc == want
    # and it normalizes into a valid symmetric graph
    ids, _ = assign_vertex_ids(store.current())
    v = validate_edges(normalize_edges(ids))
    assert v["asym"] == 0


@pytest.fixture()
def midsplit_dir(spark, tmp_path):
    """Waves that split conversations MID-conversation: wave1 = first 3
    turns of every conv, wave2 = the rest — the round-1 caveat case where
    per-batch derivation silently drops the boundary adjacency."""
    path = str(tmp_path / "midsplit")
    tr = synth_transcripts(spark, 40, seed=42)
    tr.where(F.col("turn_idx") < 3).coalesce(1).write.mode("overwrite").parquet(path + "/wave1")
    tr.where(F.col("turn_idx") >= 3).coalesce(1).write.mode("overwrite").parquet(path + "/wave2")
    return path


def test_stateful_edges_match_batch_across_midsplit(spark, midsplit_dir, tmp_path):
    store = ST.IncrementalEdgeStore(spark, str(tmp_path / "edges_stateful"))
    stream = ST.stream_transcripts(spark, midsplit_dir + "/wave*", max_files_per_trigger=1)
    q = ST.incremental_edges_stateful(stream, store, str(tmp_path / "ck3"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    acc = {(r["a"], r["b"]): r["w"] for r in store.current().collect()}
    batch = transcript_string_edges(synth_transcripts(spark, 40, seed=42))
    want = {(r["a"], r["b"]): r["w"] for r in batch.collect()}
    assert acc == want  # boundary adjacencies included — exact batch parity


def test_midsplit_without_state_loses_boundary_edges(spark, midsplit_dir, tmp_path):
    """Control for the test above: the sealed-conversation path must
    undercount on a mid-conversation split (documented contract)."""
    store = ST.IncrementalEdgeStore(spark, str(tmp_path / "edges_sealed"))
    stream = ST.stream_transcripts(spark, midsplit_dir + "/wave*", max_files_per_trigger=1)
    q = ST.incremental_edges(stream, store, str(tmp_path / "ck4"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    acc_total = sum(r["w"] for r in store.current().collect())
    batch = transcript_string_edges(synth_transcripts(spark, 40, seed=42))
    want_total = sum(r["w"] for r in batch.collect())
    assert acc_total < want_total


def test_fold_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-delivering an epoch after the
    pointer flip must be a no-op (round-2 fix for the double-count window)."""
    store = ST.IncrementalEdgeStore(spark, str(tmp_path / "edges_replay"))
    batch = spark.createDataFrame(
        [("x", "y", 1.0), ("x", "z", 2.0)], "a string, b string, w double"
    )
    store.fold_edge_increments(batch, epoch_id=0)
    once = {(r["a"], r["b"]): r["w"] for r in store.current().collect()}
    store.fold_edge_increments(batch, epoch_id=0)  # replayed epoch
    twice = {(r["a"], r["b"]): r["w"] for r in store.current().collect()}
    assert once == twice == {("x", "y"): 1.0, ("x", "z"): 2.0}
    assert store.last_epoch() == 0
    # a NEW epoch still folds
    store.fold_edge_increments(batch, epoch_id=1)
    after = {(r["a"], r["b"]): r["w"] for r in store.current().collect()}
    assert after == {("x", "y"): 2.0, ("x", "z"): 4.0}


# ---------------------------------------------------------------------------
# idle-conversation state reap (EventTimeTimeout) + epoch-floor guard
# ---------------------------------------------------------------------------


def _write_wave(spark, path, rows):
    from nido_spark.io import TRANSCRIPT_SCHEMA

    spark.createDataFrame(rows, TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


@pytest.fixture()
def abandoned_conv_dir(spark, tmp_path):
    """Conversation A goes idle for hours (state should be reaped), B keeps
    the watermark moving, then A 'resumes' long after the idle horizon."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1, 0, 0, 0)
    path = str(tmp_path / "abandoned")
    _write_wave(spark, path + "/wave1", [
        ("A", 0, "user", "hi", None, t0),
        ("A", 1, "assistant", "hello", None, t0 + timedelta(seconds=10)),
        ("A", 2, "user", "thanks", None, t0 + timedelta(seconds=20)),
    ])
    # B advances event time 3h past A (watermark passes A's 1h idle horizon)
    _write_wave(spark, path + "/wave2", [
        ("B", 0, "user", "x", None, t0 + timedelta(hours=3)),
        ("B", 1, "assistant", "y", None, t0 + timedelta(hours=3, seconds=5)),
    ])
    # this batch carries no A data -> A's armed timeout FIRES here
    _write_wave(spark, path + "/wave3", [
        ("B", 2, "user", "z", None, t0 + timedelta(hours=3, minutes=1)),
    ])
    # A resumes after the reap
    _write_wave(spark, path + "/wave4", [
        ("A", 3, "assistant", "back", None, t0 + timedelta(hours=4)),
    ])
    return path


def _run_accumulation(spark, src_dir, tmp_path, tag, **stateful_kw):
    store = ST.IncrementalEdgeStore(spark, str(tmp_path / f"edges_{tag}"))
    stream = ST.stream_transcripts(spark, src_dir + "/wave*", max_files_per_trigger=1)
    q = ST.incremental_edges_stateful(
        stream, store, str(tmp_path / f"ck_{tag}"), **stateful_kw
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return {(r["a"], r["b"]): r["w"] for r in store.current().collect()}


def test_idle_conversation_state_is_reaped(spark, abandoned_conv_dir, tmp_path):
    """With EventTimeTimeout, A's state is dropped once the watermark passes
    its idle horizon: the resumed turn starts a FRESH conversation (no
    boundary adjacency across the reap), while B's edges are unaffected."""
    with_reap = _run_accumulation(
        spark, abandoned_conv_dir, tmp_path, "reap",
        watermark="1 second", idle_timeout_s=3600,
    )
    control = _run_accumulation(spark, abandoned_conv_dir, tmp_path, "noreap")
    au = ("A:assistant", "A:user")
    # control (NoTimeout): turn3 bridges to turn2's actor -> 3 adjacencies
    assert control[au] == 3.0
    # reaped: state gone before A resumes -> only the 2 pre-idle adjacencies
    assert with_reap[au] == 2.0
    # every other edge (B's conversation) identical in both runs
    assert {k: v for k, v in with_reap.items() if k != au} == {
        k: v for k, v in control.items() if k != au
    }


def test_fresh_checkpoint_over_existing_store_raises(spark, tmp_path):
    """Epoch ids restart at 0 under a fresh streaming checkpoint; silently
    skipping them would fold nothing forever, and folding them would
    double-count — the store must refuse loudly (review finding)."""
    store = ST.IncrementalEdgeStore(spark, str(tmp_path / "edges_guard"))
    batch = spark.createDataFrame([("x", "y", 1.0)], "a string, b string, w double")
    store.fold_edge_increments(batch, epoch_id=0)
    store.fold_edge_increments(batch, epoch_id=1)
    with pytest.raises(RuntimeError, match="fresh checkpoint"):
        store.fold_edge_increments(batch, epoch_id=0)
    # same-run replay of the LAST committed epoch stays a silent no-op
    store.fold_edge_increments(batch, epoch_id=1)
    assert store.last_epoch() == 1


def test_session_window_stream_matches_batch_sessionize(spark, tmp_path):
    """Native session_window streaming rollup == the batch window-plan
    sessionizer (relational.session_stats) on tie-free data: same session
    count, same per-session n_events and min/max event times."""
    import numpy as np

    from nido_spark.relational import session_stats
    from nido_spark import streaming as ST

    rng = np.random.default_rng(23)
    rows, eid = [], 0
    for k in range(5):
        t = int(rng.integers(0, 10**4)) * 1_000_000
        for _ in range(int(rng.integers(20, 60))):
            # gaps strictly != 1800s: boundary semantics differ (docstring)
            t += int(rng.choice([1, 40, 900, 1777, 1803, 5000])) * 1_000_000
            rows.append((eid, f"c{k}", t)); eid += 1
    df = spark.createDataFrame(rows, "event_id long, conv_id string, us long").select(
        "event_id", "conv_id", F.timestamp_micros(F.col("us")).alias("ts")
    )
    path = str(tmp_path / "sess_events")
    df.where(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(path + "/w1")
    df.where(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(path + "/w2")

    stream = (
        spark.readStream.schema("event_id long, conv_id string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(path + "/w*")
    )
    agg = ST.streaming_session_stats(stream, key="conv_id", gap="30 minutes")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory").queryName("sess")
        .option("checkpointLocation", str(tmp_path / "ck_sess"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "SELECT conv_id, n_events, unix_micros(t_start) AS s, unix_micros(t_end) AS e "
            "FROM sess ORDER BY conv_id, s"
        ).collect()
    finally:
        q.stop()
    want = (
        session_stats(df, key="conv_id", gap_seconds=1800)
        .orderBy("conv_id", "t_start_us")
        .collect()
    )
    assert [(r["conv_id"], r["n_events"], r["s"], r["e"]) for r in got] == [
        (r["conv_id"], r["n_events"], r["t_start_us"], r["t_end_us"]) for r in want
    ]


def test_stream_transcripts_source_format_honored(spark, tmp_path):
    """source_format/options passthrough on the STREAMING side (mirror of
    io.read_transcripts): parquet default keeps the schema-pinned file
    stream; a named built-in format ("rate") is honored verbatim with its
    options; an unavailable format raises instead of silently falling back
    to parquet."""
    import pytest

    from nido_spark.io import synth_transcripts
    from nido_spark.streaming import stream_transcripts

    p = str(tmp_path / "txs")
    synth_transcripts(spark, 3, seed=1).write.parquet(p)
    df = stream_transcripts(spark, p)
    assert df.isStreaming and "conv_id" in df.columns

    # format passthrough: the rate source needs no path and defines its
    # own (timestamp, value) schema — reaching it proves .format() is used
    rate = stream_transcripts(
        spark, "", source_format="rate", options={"rowsPerSecond": "1"}
    )
    assert rate.isStreaming and set(rate.columns) == {"timestamp", "value"}

    with pytest.raises(Exception):
        # no kafka connector jar in this image: must raise, not fall back
        stream_transcripts(
            spark, "", source_format="kafka",
            options={"subscribe": "t", "kafka.bootstrap.servers": "x:9092"},
        )


def test_streaming_dedup_first_arrival_within_watermark(spark, tmp_path):
    """Two micro-batches with a cross-batch duplicate fingerprint: only the
    first arrival is emitted; distinct fps all survive. State is
    watermark-bounded (dropDuplicatesWithinWatermark), so the dup arriving
    within the horizon is dropped even across micro-batches."""
    import datetime as dt

    src = tmp_path / "docs"
    src.mkdir()

    def write_wave(name, rows):
        spark.createDataFrame(
            rows, "doc_id long, ts timestamp, fp string"
        ).coalesce(1).write.parquet(str(src / name))

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    write_wave("wave1", [(1, t0, "A"), (2, t0 + dt.timedelta(seconds=10), "B")])
    write_wave(
        "wave2",
        [
            (3, t0 + dt.timedelta(seconds=20), "B"),   # dup within watermark
            (4, t0 + dt.timedelta(seconds=30), "C"),
        ],
    )
    stream = (
        spark.readStream.schema("doc_id long, ts timestamp, fp string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "wave*"))
    )
    out = ST.streaming_dedup(stream, key_cols=("fp",), watermark="5 minutes")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_sink")
        .option("checkpointLocation", str(tmp_path / "ck_dedup"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {(r["doc_id"], r["fp"]) for r in spark.sql(
            "SELECT doc_id, fp FROM dedup_sink"
        ).collect()}
    finally:
        q.stop()
    assert {fp for _, fp in got} == {"A", "B", "C"}
    assert len(got) == 3 and (3, "B") not in got

    # batch path: same callable, plain dropDuplicates semantics
    batch = spark.createDataFrame(
        [(1, t0, "A"), (3, t0, "B"), (9, t0, "B")],
        "doc_id long, ts timestamp, fp string",
    )
    assert ST.streaming_dedup(batch).count() == 2


def test_count_min_sketch_streams_with_bounded_state(spark, tmp_path):
    """relational.count_min_sketch is streaming-compatible AS-IS: it is a
    pure groupBy over an exploded probe set, so in complete mode its
    state is bounded at d*2^b register rows FOREVER regardless of how
    many distinct keys flow past — the sketch's whole point, and the
    contrast with an exact per-key streaming count (unbounded state).
    Stream registers over two file waves == the batch sketch over the
    union, bit for bit."""
    from nido_spark.relational import count_min_sketch

    df = spark.createDataFrame(
        [(i, (i * i) % 97) for i in range(4000)], "event_id long, user_id long"
    )
    path = str(tmp_path / "cms_events")
    df.where(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(path + "/w1")
    df.where(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(path + "/w2")

    stream = spark.readStream.schema("event_id long, user_id long").parquet(
        path + "/w*"
    )
    sk = count_min_sketch(stream, "user_id", d=3, b=8, seed=7)
    q = (
        sk.writeStream.outputMode("complete")
        .format("memory")
        .queryName("cms_regs")
        .option("checkpointLocation", str(tmp_path / "ck_cms"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["depth"], r["bucket"]): r["cnt"]
            for r in spark.sql("SELECT * FROM cms_regs").collect()
        }
    finally:
        q.stop()
    want = {
        (r["depth"], r["bucket"]): r["cnt"]
        for r in count_min_sketch(df, "user_id", d=3, b=8, seed=7).collect()
    }
    assert got == want
    assert len(got) <= 3 * (1 << 8)


def test_stateful_tool_chains_match_batch_across_midsplit(
    spark, midsplit_dir, tmp_path
):
    """Tool-chain bigram mining streams with exact batch parity: both the
    occurrence count (SUM of increments) and the distinct-conversation
    count survive a mid-conversation micro-batch split, because the last
    tool call is carried in group state across the boundary."""
    from nido_spark.conversation import tool_chains

    stream = ST.stream_transcripts(
        spark, midsplit_dir + "/wave*", max_files_per_trigger=1
    )
    out = ST.stateful_tool_chains(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("chains")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["t1"], r["t2"]): (r["n"], r["n_convs"])
        for r in spark.sql(
            "SELECT t1, t2, SUM(w) AS n, COUNT(DISTINCT conv_id) AS n_convs"
            " FROM chains GROUP BY t1, t2"
        ).collect()
    }
    want = {
        (r["t1"], r["t2"]): (r["n"], r["n_convs"])
        for r in tool_chains(synth_transcripts(spark, 40, seed=42)).collect()
    }
    assert got == want
    assert len(want) > 0  # fixture actually exercises chains
