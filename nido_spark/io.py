"""Sources: synthetic transcript generation and edge-table derivation.

The production input shape (BASELINE.json input_hint) is an Iceberg table of
multi-turn conversation transcripts::

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp

Iceberg jars are not in this image, so the fixtures are parquet;
``read_transcripts`` takes an explicit ``source_format`` (parquet default,
"iceberg" for deployment — honored with no silent fallback) and the
derivation below is format-agnostic DataFrame code either way.

Edge derivation (replaces the reference's binary CSR loader,
/root/reference/graph.cpp:322-495, and its random generator,
/root/reference/graph.cpp:76-115):

- **role-adjacency edges**: within each conv ordered by ``turn_idx``, an edge
  between consecutive turns' actor nodes (``tool:<name>`` for tool turns,
  else ``<conv_id>:<role>``), weight = number of adjacencies.
- **conv->tool edges**: ``conv:<conv_id>`` <-> ``tool:<name>`` per tool
  invocation, weight = invocation count. Zipf-skewed on the tool side —
  this is the hub-skew case the salting helpers in graph.py exist for.

Both derivations are pure window + groupBy plans: Catalyst pushes the column
pruning into the parquet scan and the per-conv window never shuffles more
than once (partitionBy conv_id).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
        T.StructField("w", T.DoubleType(), False),
    ]
)

_TOOLS = [f"tool_{i:02d}" for i in range(50)]
_BASE_EPOCH = 1_700_000_000  # fixed base; never wall clock


def synth_transcripts(
    spark: SparkSession, n_convs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Deterministic synthetic transcripts (FIXTURES.md §1).

    Generated with a vectorized pandas iterator over ``spark.range`` — each
    conversation's rows are produced from ``default_rng([seed, conv_idx])``,
    so the output is identical regardless of partitioning or core count.
    Turns-per-conv ~ 3 + geometric(p=0.15) capped at 64; roles alternate
    user/assistant with a tool turn after ~30% of assistant turns; tool ids
    are Zipf(a=1.5)-skewed over 50 tools (creates hub vertices).
    """
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 1)

    def gen(batches):
        for pdf in batches:
            out = [_synth_conv_pdf(int(c), seed) for c in pdf["id"].to_numpy()]
            yield pd.concat(out) if out else pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in TRANSCRIPT_SCHEMA}
            )

    return (
        spark.range(0, n_convs, numPartitions=partitions)
        .mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
    )


def _synth_conv_pdf(conv_idx: int, seed: int) -> pd.DataFrame:
    """One conversation's rows, deterministic in (seed, conv_idx) — shared by
    the distributed generator above and the driver-side oracle rendering
    (synth_transcripts_pandas), so both produce identical tables."""
    rng = np.random.default_rng([seed, int(conv_idx)])
    n_turns = int(min(3 + rng.geometric(0.15), 64))
    conv_id = f"conv_{conv_idx:08d}"
    rows = {"conv_id": [], "turn_idx": [], "role": [], "text": [], "tool": []}
    turn = 0
    while turn < n_turns:
        # user / assistant alternation; a tool turn (inserted below) is
        # followed by another assistant turn.
        prev = rows["role"][-1] if rows["role"] else None
        if prev is None or prev == "assistant":
            role = "user"
        elif prev == "tool":
            role = "assistant"
        else:
            role = "assistant"
        rows["conv_id"].append(conv_id)
        rows["turn_idx"].append(turn)
        rows["role"].append(role)
        rows["text"].append(f"{conv_id}:t{turn}:{role}:" + format(rng.integers(0, 2**32), "08x"))
        rows["tool"].append(None)
        turn += 1
        if role == "assistant" and turn < n_turns and rng.random() < 0.30:
            tool = _TOOLS[min(int(rng.zipf(1.5)) - 1, 49)]
            rows["conv_id"].append(conv_id)
            rows["turn_idx"].append(turn)
            rows["role"].append("tool")
            rows["text"].append(f"{conv_id}:t{turn}:tool:{tool}")
            rows["tool"].append(tool)
            turn += 1
    n = len(rows["conv_id"])
    ts = _BASE_EPOCH + (int(conv_idx) % 86_400) * 60 + np.arange(n) * 7
    return pd.DataFrame(
        {
            "conv_id": rows["conv_id"],
            "turn_idx": np.array(rows["turn_idx"], dtype="int32"),
            "role": rows["role"],
            "text": rows["text"],
            "tool": rows["tool"],
            "ts": pd.to_datetime(ts, unit="s"),
        }
    )


def synth_transcripts_pandas(n_convs: int, seed: int = 42) -> pd.DataFrame:
    """Driver-side rendering of synth_transcripts (identical rows, no Spark)
    — used to embed the fixture as a VALUES literal in DuckDB oracle SQL so
    the transcript->edges DERIVATION is value-checked against an independent
    engine."""
    return pd.concat(
        [_synth_conv_pdf(i, seed) for i in range(n_convs)], ignore_index=True
    )


def read_transcripts(
    spark: SparkSession,
    path: str,
    source_format: str = "parquet",
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Load the transcripts table from ``path`` in ``source_format``.

    - ``"parquet"`` (default, the sandbox fixture format): schema-pinned
      parquet read.
    - ``"iceberg"`` (the deployment source per SURVEY §1.5): pass either a
      metadata path or a catalog-qualified table identifier; requires the
      Iceberg runtime jar + catalog conf on the session — supply it via
      ``get_spark(extra_conf={...})``, e.g.::

          get_spark(extra_conf={
            "spark.sql.catalog.lake": "org.apache.iceberg.spark.SparkCatalog",
            "spark.sql.catalog.lake.type": "rest",
            "spark.sql.catalog.lake.uri": "<catalog-uri>",
          })
          read_transcripts(spark, "lake.db.transcripts", source_format="iceberg")

    - any other format string is passed straight to
      ``spark.read.format(...)`` (delta, orc, ...).

    ``options`` are forwarded to the reader verbatim. The format is always
    honored — no silent fallback: a misconfigured Iceberg deployment fails
    loudly instead of quietly reading a stale parquet mirror."""
    reader = spark.read
    if options:
        reader = reader.options(**options)
    if source_format == "parquet":
        return reader.schema(TRANSCRIPT_SCHEMA).parquet(path)
    return reader.format(source_format).load(path)


def conv_actor_expr():
    """The canonical transcript actor naming — conv-scoped roles
    ('<conv_id>:<role>'), GLOBAL tool actors ('tool:<name>') — as a
    Column expression. SINGLE home (review r5): transcript_string_edges,
    graph.transcripts_to_temporal_edges and every oracle rendering rely
    on this exact derivation; graph.wl_flow_fingerprint deliberately
    uses bare-role actors instead (cross-conversation structural
    comparison) and documents the difference."""
    return F.when(
        F.col("role") == "tool", F.concat(F.lit("tool:"), F.col("tool"))
    ).otherwise(F.concat(F.col("conv_id"), F.lit(":"), F.col("role")))


def transcript_string_edges(
    transcripts: DataFrame, directed: bool = False
) -> DataFrame:
    """String-endpoint edge list (a, b, w) from transcripts — one direction,
    canonicalized a<=b; weights = adjacency/invocation counts.

    Role-adjacency uses ``Window.partitionBy(conv_id).orderBy(turn_idx)`` +
    ``lead`` (stable turn ordering per the input_hint invariant); conv->tool
    edges are a plain groupBy. Reference analogue: the CSR loader's edge
    canonicalization (graph.cpp:63-74) — here dedup happens via groupBy, no
    sort needed.

    ``directed=True`` keeps conversation-flow direction instead of
    canonicalizing: a role-adjacency edge points from the EARLIER turn's
    actor to the later one's, and conv->tool edges point conv -> tool —
    the input of the directed-graph metrics (``graph.reciprocity``,
    ``graph.in_out_degree``). Consecutive turns by the same actor yield
    directed self-loops; they are kept (callers filter).
    """
    t = transcripts.select("conv_id", "turn_idx", "role", "tool")
    actor = conv_actor_expr()
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    pair = (
        t.withColumn("a", actor)
        .withColumn("b", F.lead("a").over(w))
        .where(F.col("b").isNotNull())
    )
    if not directed:
        pair = pair.select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
    adj = (
        pair.select("a", "b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    conv_tool = (
        t.where(F.col("tool").isNotNull())
        .select(
            F.concat(F.lit("conv:"), F.col("conv_id")).alias("a"),
            F.concat(F.lit("tool:"), F.col("tool")).alias("b"),
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    # same (a,b) can appear in both derivations only if names collided —
    # they cannot (disjoint prefixes) — but a final groupBy keeps the
    # contract airtight and costs one map-side-combined shuffle.
    return adj.unionByName(conv_tool).groupBy("a", "b").agg(F.sum("w").alias("w"))


def assign_vertex_ids(string_edges: DataFrame, strategy: str = "hash") -> tuple[DataFrame, DataFrame]:
    """Map string endpoints to int64 vertex ids.

    Returns ``(edges, vmap)`` where ``edges`` is (src,dst,w) one-directional
    and ``vmap`` is (name, v).

    - ``hash``  (default, the 100TB path): ``xxhash64(name)`` — no global
      sort, no driver bottleneck; ids are sparse. Collisions are possible in
      principle; ``verify_vertex_ids`` checks distinct(name)==distinct(v).
    - ``dense`` (test/parity path): rank over sorted names -> 0..NV-1 dense
      ids, mirroring the reference's dense CSR ids. Costs a global sort of
      the vertex set (V rows, not E) — fine at test scale, avoid at 100TB.
    """
    names = (
        string_edges.select(F.col("a").alias("name"))
        .unionByName(string_edges.select(F.col("b").alias("name")))
        .distinct()
    )
    if strategy == "hash":
        vmap = names.select("name", F.xxhash64("name").alias("v"))
    elif strategy == "dense":
        w = Window.orderBy("name")
        vmap = names.select(
            "name", (F.row_number().over(w) - 1).cast("long").alias("v")
        )
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
    edges = (
        string_edges.join(vmap.withColumnRenamed("name", "a").withColumnRenamed("v", "src"), "a")
        .join(vmap.withColumnRenamed("name", "b").withColumnRenamed("v", "dst"), "b")
        .select("src", "dst", "w")
    )
    return edges, vmap


def verify_vertex_ids(string_edges: DataFrame, vmap: DataFrame) -> bool:
    """True iff the id assignment is collision-free."""
    agg = vmap.agg(
        F.countDistinct("name").alias("n"), F.countDistinct("v").alias("d")
    ).first()
    return agg["n"] == agg["d"]


def transcripts_to_edges(transcripts: DataFrame, strategy: str = "hash") -> DataFrame:
    """transcripts -> canonical symmetric edge DataFrame (src,dst,w)."""
    from nido_spark.graph import normalize_edges

    one_dir, _ = assign_vertex_ids(transcript_string_edges(transcripts), strategy)
    return normalize_edges(one_dir)


def transcripts_to_directed_edges(
    transcripts: DataFrame, strategy: str = "hash"
) -> DataFrame:
    """transcripts -> DIRECTED edge DataFrame (src, dst, w): conversation-flow
    role-adjacency (earlier turn's actor -> later turn's actor) plus
    conv -> tool invocation edges, weights = counts. NOT symmetrized and NOT
    canonicalized — (u,v) and (v,u) are distinct rows; directed self-loops
    (consecutive same-actor turns) are kept. This is the input shape of the
    directed metrics (``graph.reciprocity``, ``graph.in_out_degree``);
    ``normalize_edges`` of this table equals ``transcripts_to_edges`` of the
    same transcripts (pytest-pinned invariant)."""
    one_dir, _ = assign_vertex_ids(
        transcript_string_edges(transcripts, directed=True), strategy
    )
    return one_dir.select(
        F.col("src").cast("long"),
        F.col("dst").cast("long"),
        F.col("w").cast("double"),
    )


# ---------------------------------------------------------------------------
# SQL-derivable edge tables over the driver's TPC-H-ish fixtures
# (FIXTURES.md §4) — used by __spark_entry__.queries() so every graph
# primitive has a DuckDB oracle.
# ---------------------------------------------------------------------------

SUPP_OFFSET = 10_000_000


def lineitem_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part <-> supplier co-occurrence graph, symmetrized, weights = sum qty.

    Oracle SQL shape (FIXTURES.md §4)::

        WITH e0 AS (SELECT l_partkey AS src, 10000000 + l_suppkey AS dst,
                           SUM(l_quantity) AS w FROM lineitem GROUP BY 1,2)
        SELECT src,dst,w FROM e0 UNION ALL SELECT dst,src,w FROM e0
    """
    from nido_spark.graph import mirror_edges

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    e0 = (
        li.groupBy(
            F.col("l_partkey").alias("src"),
            (F.lit(SUPP_OFFSET) + F.col("l_suppkey")).alias("dst"),
        )
        .agg(F.sum("l_quantity").alias("w"))
    )
    # single-pass symmetrize: a union of e0 with its swap would run the
    # lineitem aggregation TWICE (one per branch); the explode mirrors the
    # aggregated rows map-side. src/dst id ranges are disjoint (SUPP_OFFSET)
    # so self-loop handling is moot.
    return mirror_edges(e0, self_loops_once=False)


LINEITEM_EDGES_SQL = """
WITH e0 AS (
  SELECT l_partkey AS src, 10000000 + l_suppkey AS dst, SUM(l_quantity) AS w
  FROM lineitem GROUP BY 1, 2
)
SELECT src, dst, w FROM e0
UNION ALL
SELECT dst AS src, src AS dst, w FROM e0
"""


def events_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """user <-> event_type bipartite graph, weights = event counts."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    types = ev.select("event_type").distinct()
    w = Window.orderBy("event_type")
    tmap = types.select(
        "event_type", (F.lit(20_000_000) + F.row_number().over(w)).cast("long").alias("tid")
    )
    e0 = (
        ev.join(F.broadcast(tmap), "event_type")
        .groupBy(F.col("user_id").alias("src"), F.col("tid").alias("dst"))
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    from nido_spark.graph import mirror_edges

    # one aggregation, map-side mirror (ids disjoint — see lineitem_edges)
    return mirror_edges(e0, self_loops_once=False)


EVENTS_EDGES_SQL = """
WITH tmap AS (
  SELECT event_type,
         20000000 + ROW_NUMBER() OVER (ORDER BY event_type) AS tid
  FROM (SELECT DISTINCT event_type FROM events)
), e0 AS (
  SELECT e.user_id AS src, t.tid AS dst, CAST(COUNT(*) AS DOUBLE) AS w
  FROM events e JOIN tmap t USING (event_type) GROUP BY 1, 2
)
SELECT src, dst, w FROM e0
UNION ALL
SELECT dst AS src, src AS dst, w FROM e0
"""


def ba_random_edges(
    spark: SparkSession, nv: int, m0: int = 4, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Deterministic preferential-attachment-ish random graph, mirroring the
    semantics of the reference's built-in generator
    (/root/reference/graph.cpp:76-115): each vertex i >= m0 attaches to m0
    earlier vertices (degree-biased), both directions inserted, weights
    |N(1,1)| (abs-Gaussian). Vectorized generation per vertex chunk with
    ``default_rng([seed, i])`` — partition-invariant.

    The degree bias is approximated by sampling targets as
    ``floor(u^2 * i)`` (quadratic skew toward old/high-degree vertices) so
    generation stays embarrassingly parallel — the reference's exact
    sequential attachment kernel cannot be parallelized without a serial
    dependency chain, and only the *shape* (heavy-tail) matters for tests.
    """
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 1)

    def gen(batches):
        for pdf in batches:
            rows_src, rows_dst, rows_w = [], [], []
            for i in pdf["id"].to_numpy():
                i = int(i)
                if i < m0:
                    continue
                rng = np.random.default_rng([seed, i])
                tgt = np.unique(np.floor(rng.random(m0) ** 2 * i).astype(np.int64))
                w = np.abs(rng.normal(1.0, 1.0, size=len(tgt))) + 1e-9
                rows_src.append(np.full(len(tgt), i, dtype=np.int64))
                rows_dst.append(tgt)
                rows_w.append(w)
            if rows_src:
                yield pd.DataFrame(
                    {
                        "src": np.concatenate(rows_src),
                        "dst": np.concatenate(rows_dst),
                        "w": np.concatenate(rows_w),
                    }
                )
            else:
                yield pd.DataFrame({"src": pd.Series(dtype="int64"),
                                    "dst": pd.Series(dtype="int64"),
                                    "w": pd.Series(dtype="float64")})

    one_dir = spark.range(0, nv, numPartitions=partitions).mapInPandas(gen, schema=EDGE_SCHEMA)
    from nido_spark.graph import normalize_edges

    return normalize_edges(one_dir)


def write_bucketed_edges(
    edges: DataFrame,
    table_name: str,
    buckets: int = 64,
    path: str | None = None,
    sink_format: str = "parquet",
    options: dict[str, str] | None = None,
) -> None:
    """Bucketed + sorted edge sink: ``bucketBy(buckets, "src").sortBy("src")``
    table. Two tables bucketed on the same key with the same bucket
    count join WITHOUT a shuffle (bucket alignment replaces the exchange) —
    the at-rest layout for repeated joins/aggregations on src at 100 TB,
    where re-shuffling E rows per query is the dominant cost. The same idea
    the reference bakes into its CSR layout (adjacency grouped by vertex,
    graph.cpp:322-495), expressed as a Spark table property instead of a
    file format.

    ``sink_format``/``options`` mirror ``read_transcripts``'s source hook on
    the write side: the format string goes straight to ``.format(...)``
    (e.g. ``"orc"``; for an Iceberg/Delta catalog put the catalog conf on
    the session via ``get_spark(extra_conf=...)`` and pass a
    catalog-qualified ``table_name``). Always honored, no silent fallback.
    NOTE Iceberg ignores Spark's Hive-style bucketBy — for Iceberg use a
    ``bucket(N, src)`` partition transform on the table DDL instead; this
    writer targets formats with Spark bucket metadata (parquet/orc)."""
    writer = edges.write.format(sink_format).mode("overwrite")
    if options:
        writer = writer.options(**options)
    writer = writer.bucketBy(buckets, "src").sortBy("src")
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def write_labels(
    labels: DataFrame,
    path: str,
    order_by_vertex: bool = False,
    sink_format: str = "parquet",
    options: dict[str, str] | None = None,
) -> None:
    """Community sink (reference: one id per line text dump,
    /root/reference/clustering.cpp:23-46) — parquet by default, optionally
    range-ordered by vertex for deterministic file layout.

    ``sink_format``/``options`` are forwarded verbatim (write-side mirror
    of the read hook): ``"parquet"``/``"orc"``/``"csv"``/... go through
    ``.format(...).save(path)``; a catalog-managed lake table (Iceberg/
    Delta with the catalog conf on the session) is addressed by passing the
    catalog-qualified identifier via ``saveAsTable`` — use
    ``write_labels_table`` for that."""
    out = labels.orderBy("v") if order_by_vertex else labels
    writer = out.write.format(sink_format).mode("overwrite")
    if options:
        writer = writer.options(**options)
    writer.save(path)


def write_labels_table(
    labels: DataFrame,
    table_name: str,
    sink_format: str = "parquet",
    options: dict[str, str] | None = None,
) -> None:
    """Catalog-managed community sink: ``saveAsTable`` against whatever
    catalog ``table_name`` is qualified with (session catalog in the
    sandbox; an Iceberg/Delta catalog in a deployment via
    ``get_spark(extra_conf={"spark.sql.catalog...."})``). The format is
    always honored — a misconfigured catalog fails loudly."""
    writer = labels.write.format(sink_format).mode("overwrite")
    if options:
        writer = writer.options(**options)
    writer.saveAsTable(table_name)


def read_labels(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema("v long, comm long").parquet(path)
