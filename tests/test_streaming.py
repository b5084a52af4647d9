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
