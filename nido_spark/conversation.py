"""Conversation-level analytics over the transcripts table
(conv_id, turn_idx, role, text, tool, ts) — the engine's production
input shape (FIXTURES.md §1). These are the transcript-native
complements of the graph derivation in io.transcripts_to_edges: they
read the SAME table but aggregate per conversation / per role-pair
instead of projecting to vertices.

Both operators are single-pass: one window (per-conv lead) or one
grouped aggregation, everything map-side-combinable; no self-joins, no
per-conv collects — at 10^9 conversations each conv is one group/window
partition and hot convs are capped by the 64-turn generation bound (or
the producer's own cap in deployment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def role_transitions(transcripts: DataFrame) -> DataFrame:
    """(from_role, to_role, n, p) — the conversation's role Markov
    chain: counts of consecutive (turn i -> turn i+1) role pairs within
    each conversation in turn_idx order, and the per-from_role
    transition probability p = n / sum_to(n) (rounded to 9 dp; exact
    integer counts, one double division). The dialogue-structure
    fingerprint: user->assistant should dominate, assistant->tool
    measures tool-call rate, tool->tool flags chained calls."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    pairs = (
        transcripts.select(
            "conv_id",
            "turn_idx",
            F.col("role").alias("from_role"),
            F.lead("role").over(w).alias("to_role"),
        )
        .where(F.col("to_role").isNotNull())
        .groupBy("from_role", "to_role")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = pairs.groupBy("from_role").agg(F.sum("n").alias("tot"))
    return pairs.join(tot, "from_role").select(
        "from_role",
        "to_role",
        "n",
        F.round(F.col("n") / F.col("tot"), 9).alias("p"),
    )


def response_latency(transcripts: DataFrame) -> DataFrame:
    """(from_role, to_role, n, mean_us, p50_us, p95_us) — response-time
    distribution per consecutive role pair: the gap in microseconds
    between turn i and turn i+1 within each conversation in turn_idx
    order, aggregated per (from_role, to_role) with the count, the mean
    (exact integer sum, one double division, 9 dp), and EXACT p50/p95
    (PERCENTILE_DISC semantics: the smallest gap whose cumulative count
    reaches the quantile — the textops.exact_quantiles rule, here per
    group). The operational dashboard staple: how fast does the
    assistant answer, how long do tool calls take.

    100 TB shape: one per-conv lead window (bounded by the turn cap),
    then everything runs on the DISTINCT-GAP axis — groupBy
    (pair, gap) counts map-side, and the cumulative window sorts
    O(distinct gaps) rows per role pair (at most 9ish pairs), never
    O(turns). The quantile comparison is cum/n >= p, the exact
    cume_dist rule — never ceil(p*n), whose float representation error
    returns the wrong quantile (the r5 exact_quantiles review
    finding)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    seq = transcripts.select(
        F.col("role").alias("from_role"),
        F.lead("role").over(w).alias("to_role"),
        (F.lead(us).over(w) - us).alias("gap_us"),
    ).where(F.col("to_role").isNotNull())
    counts = seq.groupBy("from_role", "to_role", "gap_us").agg(
        F.count(F.lit(1)).alias("c")
    )
    pair = Window.partitionBy("from_role", "to_role")
    cum = counts.select(
        "from_role",
        "to_role",
        "gap_us",
        "c",
        F.sum("c")
        .over(pair.orderBy("gap_us").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
        F.sum("c")
        .over(
            pair.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("n"),
    )

    def q(p: float):
        return F.min(F.when(F.col("cum") / F.col("n") >= p, F.col("gap_us")))

    return cum.groupBy("from_role", "to_role").agg(
        F.max("n").cast("long").alias("n"),
        F.round(F.sum(F.col("gap_us") * F.col("c")) / F.max("n"), 9).alias(
            "mean_us"
        ),
        q(0.5).alias("p50_us"),
        q(0.95).alias("p95_us"),
    )


def conversation_stats(transcripts: DataFrame) -> DataFrame:
    """(conv_id, n_turns, n_user, n_assistant, n_tool, n_distinct_tools,
    first_tool_turn) — per-conversation shape statistics in ONE grouped
    aggregation: turn counts per role (conditional counts, not a
    pivot), distinct tools invoked, and the turn index of the first
    tool call (NULL when the conversation never calls a tool). The
    per-conv feature row for curriculum/filtering decisions over a
    transcript corpus (drop tool-free convs, cap tool-heavy ones,
    stratify by depth)."""
    return transcripts.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum((F.col("role") == "user").cast("int")).cast("long").alias("n_user"),
        F.sum((F.col("role") == "assistant").cast("int"))
        .cast("long")
        .alias("n_assistant"),
        F.sum((F.col("role") == "tool").cast("int")).cast("long").alias("n_tool"),
        F.count_distinct("tool").cast("long").alias("n_distinct_tools"),
        F.min(F.when(F.col("role") == "tool", F.col("turn_idx")))
        .cast("long")
        .alias("first_tool_turn"),
    )


def tool_chains(
    transcripts: DataFrame, max_turn_gap: int | None = None
) -> DataFrame:
    """(t1, t2, n, n_convs) — tool-call sequence mining: for each
    conversation, the sequence of tool invocations in turn_idx order
    (non-tool turns skipped), counted as consecutive-invocation bigrams
    t1 -> t2 with the total occurrence count and the number of distinct
    conversations exhibiting the pair. The agent-behavior staple the
    transcript corpus exists to answer (which tool follows which —
    retrieval->code? search->search loops?); the reference has no
    transcript-native analytics, so this derives from the same table
    its edge projection reads (io.transcripts_to_edges).

    ``max_turn_gap`` (optional): only count a bigram when the second
    call happens within that many turns of the first — separates
    actual chains from distant re-use inside long conversations.

    100 TB shape: one filter (tool IS NOT NULL — pushed to the scan),
    one per-conv lead window over the FILTERED rows (tool turns only,
    a small fraction of the corpus and bounded by the per-conv turn
    cap), one map-side-combinable groupBy over (t1, t2) pairs whose
    cardinality is O(n_tools^2), not O(rows). count_distinct(conv_id)
    is the only non-combinable term; tool-pair cardinality keeps the
    final exchange tiny."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    seq = (
        transcripts.where(F.col("tool").isNotNull())
        .select(
            "conv_id",
            "turn_idx",
            F.col("tool").alias("t1"),
            F.lead("tool").over(w).alias("t2"),
            (F.lead("turn_idx").over(w) - F.col("turn_idx")).alias("gap"),
        )
        .where(F.col("t2").isNotNull())
    )
    if max_turn_gap is not None:
        seq = seq.where(F.col("gap") <= int(max_turn_gap))
    return seq.groupBy("t1", "t2").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count_distinct("conv_id").cast("long").alias("n_convs"),
    )


def tool_loops(
    transcripts: DataFrame, period: int = 1, min_len: int = 3
) -> DataFrame:
    """(conv_id, start_call, length, tool) — periodic tool-call tails:
    maximal stretches of the conversation's tool-invocation sequence
    (turn_idx order, non-tool turns skipped) where call i repeats call
    i - ``period``. ``period=1`` finds same-tool hammering (A A A ...),
    ``period=2`` finds two-tool ping-pong (A B A B ...), the two classic
    stuck-agent signatures a 10^12-turn transcript lake is mined for.
    ``start_call``/``length`` are 1-based positions in the conv's
    tool-call sequence (length counts ALL calls in the periodic stretch,
    including the seed ``period`` calls); ``tool`` is the invocation at
    the stretch's LAST seed call (position start_call + period - 1 —
    for period=1 that is the hammered tool itself; for period=2 it is
    the second tool of the ping-pong pair). Only stretches with
    length >= ``min_len`` are returned. All integers + one string —
    exact across engines.

    100 TB shape: the tool_chains discipline — one pushed-down filter,
    ONE per-conv window (lag + running non-match count builds the
    gaps-and-islands block id), one groupBy over (conv, block); per-conv
    work is bounded by the turn cap, and only flagged stretches survive
    the final filter."""
    if period < 1:
        raise ValueError("tool_loops: period must be >= 1")
    if min_len <= period:
        raise ValueError("tool_loops: min_len must exceed period")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    calls = (
        transcripts.where(F.col("tool").isNotNull())
        .select(
            "conv_id",
            "tool",
            F.row_number().over(w).alias("ci"),
            (F.col("tool") == F.lag("tool", period).over(w))
            .cast("int")
            .alias("eq"),
        )
        .select(
            "conv_id", "tool", "ci", F.coalesce(F.col("eq"), F.lit(0)).alias("eq")
        )
    )
    wc = Window.partitionBy("conv_id").orderBy("ci")
    blocks = calls.withColumn(
        "blk", F.sum(F.lit(1) - F.col("eq")).over(wc)
    )
    runs = blocks.groupBy("conv_id", "blk").agg(
        F.sum("eq").cast("long").alias("n_rep"),
        F.min("ci").alias("blk_start"),
        F.min_by("tool", "ci").alias("blk_tool"),
    )
    p = int(period)
    return (
        runs.where(F.col("n_rep") >= 1)
        .select(
            "conv_id",
            # the stretch begins `period - 1` calls before the block head
            # (the seed calls live in the preceding blocks)
            (F.col("blk_start") - F.lit(p - 1)).cast("long").alias("start_call"),
            (F.col("n_rep") + F.lit(p)).cast("long").alias("length"),
            F.col("blk_tool").alias("tool"),
        )
        .where(F.col("length") >= int(min_len))
    )
