"""Time-series relational operators the reference lacks but a large-scale
event/transcript pipeline needs: as-of join and gap sessionization.

Both are rendered as SINGLE-SHUFFLE window plans (hash-partition by key,
sort within partition — Spark's window sort is external/spillable), the
composition the build brief calls out for operators Spark lacks natively:

- ``asof_join``  — union the two sides tagged, one window pass carries the
  most recent right-side payload forward onto each left row. Equivalent to
  DuckDB/kdb ASOF JOIN (backward, inclusive), which is exactly what the
  driver oracle runs.
- ``sessionize`` — gap-based session ids per key: lag + boundary flag +
  running sum, all in one window partition pass. Timestamps compare as
  exact integer microseconds (unix_micros / epoch_us), never floating
  seconds.

Skew note (100 TB): both partition by the entity key; a mega-hot key lands
in one window partition. The sort spills, but if one key's event volume
exceeds a single task's disk budget, pre-split by coarse time range and
stitch the boundary rows (the asof tag-union makes the stitch a second
tiny window over range boundaries). Not implemented here — documented as
the scale-out path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward-inclusive as-of join: each left row gains the right row with
    the largest ``right_ts <= left_ts`` for the same ``on`` key (nulls when
    no prior right row exists). Assumes (on, right_ts) is unique on the
    right side; equal timestamps match (inclusive).

    Plan shape: tag both sides, union, ONE window over (key, ts, side) with
    ``last(payload, ignorenulls=True)`` — a single hash-partition shuffle,
    no range join, no per-key collect."""
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]
    payload = [f"{c}{suffix}" for c in right_cols]
    left_cols = list(left.columns)
    clash = set(payload) & set(left_cols)
    if clash:
        raise ValueError(f"suffix collision on {sorted(clash)}; pick another suffix")

    # a NULL right timestamp would sort FIRST under asc() and poison every
    # left row of its key with a bogus match; ASOF semantics (and DuckDB's
    # ts >= ts, NULL -> false) say it can never match — drop it up front.
    # NULL LEFT timestamps need no handling: they sort before every real
    # right row, so last(payload) is null = no match, same as the oracle.
    right = right.where(F.col(right_ts).isNotNull())

    # the union carries the LEFT payload through the window too (nulls on
    # right rows), so no row-id + re-join is needed — one shuffle total and
    # no nondeterministic ids that could diverge across branch recomputes.
    # The right payload travels as ONE struct: per-column last(ignorenulls)
    # would backfill a NULL field from an OLDER right row, stitching fields
    # of different right rows together (and an all-NULL payload row would
    # be invisible). A struct is non-null whenever the row exists, so the
    # window carries the whole matched row or nothing.
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        F.struct(*[F.col(c).alias(p) for c, p in zip(right_cols, payload)]).alias("_pay"),
    )
    pay_type = r.schema["_pay"].dataType
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *left_cols,
        F.lit(None).cast(pay_type).alias("_pay"),
    )
    # side=0 sorts before side=1 at equal ts -> inclusive match
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).select(
        "_side",
        *left_cols,
        F.last("_pay", ignorenulls=True).over(w).alias("_pay"),
    )
    return carried.where(F.col("_side") == 1).select(
        *left_cols, *[F.col(f"_pay.{p}").alias(p) for p in payload]
    )


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_tiebreak: str | None = "event_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the key's previous event exceeds ``gap_seconds``. Adds ``session_idx``
    (0-based per key) — one window partition pass, integer-microsecond
    comparisons."""
    order = [F.col(ts_col).asc()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(key).orderBy(*order)
    # parquet TIMESTAMP_NTZ -> timestamp (session tz is pinned to UTC)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(us).over(w)
    new_sess = F.when(
        prev.isNull() | ((us - prev) > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    running = Window.partitionBy(key).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn(
        "session_idx", (F.sum(new_sess).over(running) - 1).cast("long")
    )


def extract_json_field(
    df: DataFrame,
    json_col: str,
    path: str,
    out_col: str,
    cast: str | None = None,
) -> DataFrame:
    """Add ``out_col`` extracted from a JSON string column via a JSONPath
    (``$.field``). JVM-side ``get_json_object`` — no Python, pushes through
    codegen; prefer ``from_json`` with an explicit schema when the whole
    object is needed instead of one field."""
    c = F.get_json_object(F.col(json_col), path)
    if cast:
        c = c.cast(cast)
    return df.withColumn(out_col, c)


def session_stats(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """(key, session_idx, n_events, duration_us, t_start, t_end) — the
    per-session rollup on top of sessionize; one additional groupBy."""
    s = sessionize(events, key, ts_col, gap_seconds)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return s.groupBy(key, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(us) - F.min(us)).alias("duration_us"),
        F.min(us).alias("t_start_us"),
        F.max(us).alias("t_end_us"),
    )
