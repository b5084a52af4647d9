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
