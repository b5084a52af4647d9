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
