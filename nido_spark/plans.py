"""Plan hygiene for iterative DataFrame algorithms.

``truncate_lineage`` is the engine's single most important scale primitive.
Iterative graph algorithms rebind their state DataFrame (labels, ranks)
every iteration; two independent things then grow without bound:

1. **RDD/plan lineage** — each iteration nests joins over the previous
   plan; after ~50 iterations planning time exceeds execution time.
   Standard fix: ``localCheckpoint`` (materialize + cut lineage).

2. **Cost-estimate blow-up** (subtle, found empirically on this engine):
   Spark's ``Dataset.checkpoint``/``localCheckpoint`` produce a
   ``LogicalRDD`` that *carries over the stats estimate of the plan it
   replaced*. Join size estimates multiply child estimates
   (``SizeInBytesOnlyStatsPlanVisitor.visitJoin`` — a BigInt product), so
   the carried estimate of iteration N is a product of ~7 factors of the
   estimate of iteration N-1: the BigInt's *digit count* grows
   geometrically, and by ~iteration 8 the driver spends minutes per plan
   inside Toom-Cook BigInteger multiplication. This is invisible at 3
   iterations and fatal at 10, at any data size.

``truncate_lineage`` therefore localCheckpoints AND re-wraps the
materialized RDD in a fresh ``LogicalRDD`` with no carried stats (via
``SparkSession.internalCreateDataFrame`` — JVM-side, zero data movement,
no Python serialization). The fresh leaf reports the default size estimate,
which is constant per iteration — broadcast-vs-shuffle choices are then made
by AQE at runtime from *actual* materialized sizes, which is more reliable
than the compounded static guesses anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_input(df: DataFrame) -> DataFrame:
    """Round-robin repartition a low-parallelism input up to the session's
    default parallelism; no-op otherwise.

    Why (round 6, measured): the sandbox fixtures are single-file,
    single-row-group parquet, so every scan is ONE task and all pre-shuffle
    per-row work (shingling, hashing, regex scoring, Arrow kernels)
    serializes on one core — minhash signatures measured 6.7 s on one task
    vs 1.1 s spread. This is the guide's input-skew remedy ("one huge
    unsplittable file: repartition immediately after the read"): a cheap
    round-robin exchange of the raw rows buys a fully parallel map stage.
    Scale-adaptive by construction — any production table already carries
    >= cluster-parallelism partitions and the helper is a no-op, so no
    extra shuffle appears at 100 TB. Streaming inputs and plans whose
    partitioning cannot be inspected pass through untouched.

    Round-robin (not hash) keys: per-row map work has no key affinity, and
    Spark's sort-before-repartition keeps the assignment deterministic
    under task retry (SPARK-23207). Row placement never changes operator
    results — every caller is a per-row map or feeds a keyed exchange.
    """
    try:
        if df.isStreaming:
            return df
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    p = df.sparkSession.sparkContext.defaultParallelism
    if n >= p:
        return df
    return df.repartition(p)


def truncate_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize ``df``, cut its lineage, and reset its stats estimate.

    Use at every iteration boundary of an iterative algorithm. Falls back to
    plain ``localCheckpoint`` if the internal JVM API is unavailable (e.g.
    Spark Connect), where the stats blow-up must be handled by bounding
    iteration count instead.
    """
    ck = df.localCheckpoint(eager=eager)
    try:
        spark = df.sparkSession
        jdf = ck._jdf  # type: ignore[attr-defined]
        fresh = spark._jsparkSession.internalCreateDataFrame(  # type: ignore[attr-defined]
            jdf.queryExecution().toRdd(), jdf.schema(), False
        )
        return DataFrame(fresh, spark)
    except Exception:
        return ck
