"""Batched multi-phase Louvain as iterative DataFrame plans.

Semantics are pinned by the NumPy oracle in oracle.py (which itself encodes
the reference schedule, /root/reference/louvain_gpu.cpp:53-121); this module
renders each step as Catalyst-optimizable DataFrame operations:

=============================  ==============================================
reference kernel               Spark rendering
=============================  ==============================================
fill_edges_community_ids       edges JOIN labels ON dst      (shuffle-hash /
  (graph_cuda.cu:49-121)         broadcast once coarse — AQE decides)
copy_weights self-loop mask    WHEN(src=dst, 0.0)
  (graph_cuda.cu:2263-2348)
sort + reduce_by_key           groupBy(src, dst_comm).sum  (hash aggregate,
  (graph_gpu.cpp:484-512)        partial+final, no sort needed)
louvain_update gain argmax     gain expression + max(struct(gain,-comm))
  (graph_cuda.cu:1450-1540)      deterministic tie-break: smallest comm id
update_community_weights       full recompute: labels JOIN vertices
  (graph_cuda.cu:1222-1269)      groupBy(comm).sum(k) — idempotent, no atomics
update_community_ids (swap)    retain prev labels DataFrame; rollback =
  restore_community              rebind (louvain_gpu.cpp:79,85-90)
compute_modularity             edges JOIN labels(src) JOIN labels(dst)
  (graph_cuda.cu:2078-2134)      WHERE same comm -> sum / (2m)  minus
                                 sum(a_c^2)/(4m^2)
aggregation / coarsening       edges JOIN labels(src) JOIN labels(dst)
  (graph_gpu.cpp:1382-1545)      groupBy(comm_src, comm_dst).sum(w)
=============================  ==============================================

Scale notes (the 100 TB story):

- every sweep is a bounded number of shuffles of E rows (the candidate join
  + aggregate dominates); labels/vertex tables are V rows and become
  broadcast-joinable once coarsening shrinks the graph — AQE flips the
  strategy automatically because we localCheckpoint (and thereby re-stat)
  the per-phase edge table;
- lineage is truncated with ``localCheckpoint`` every sweep — without this,
  100+ iterations make the Catalyst plan exponentially deep (the single worst
  failure mode of iterative DataFrame code);
- batch filtering uses ``pmod(src, nbatches)`` so a batch's candidate
  aggregation scans E/nbatches edges: the total per-sweep shuffle volume is
  ~one full pass over E regardless of nbatches;
- hot (hub) vertices: the candidate aggregate groups by (src, dst_comm) —
  a Zipf hub fans out across its distinct neighbor communities, and
  map-side partial aggregation + AQE skew handling absorb the residue.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nido_spark import graph as G
from nido_spark.plans import truncate_lineage


def community_weights(labels: DataFrame, verts: DataFrame) -> DataFrame:
    """a_c = sum of k over members (reference commWeights_, graph_gpu.hpp:44)."""
    return (
        labels.join(verts.select("v", "k"), "v")
        .groupBy("comm")
        .agg(F.sum("k").alias("a_c"))
    )


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    m: float,
    verts: DataFrame | None = None,
    broadcast_labels: bool = False,
    gamma: float = 1.0,
) -> float:
    """Q = internal/(2m) - gamma*sum(a_c^2)/(4m^2); self-loops count as
    internal. ``gamma`` is the Reichardt-Bornholdt resolution parameter
    (1.0 = classic Newman-Girvan modularity).

    Both scalar reductions run as ONE Spark job (union of two tagged
    aggregates) — Q is evaluated once per sweep, so action count here is a
    direct multiplier on the driver's per-sweep overhead.
    ``broadcast_labels`` statically broadcasts the label table (gated by
    the caller on vertex count, same as the sweep kernel)."""
    if verts is None:
        verts = G.vertices(edges)
    bc = F.broadcast if broadcast_labels else (lambda df: df)
    lab_src = bc(labels.select(F.col("v").alias("src"), F.col("comm").alias("c_src")))
    lab_dst = bc(labels.select(F.col("v").alias("dst"), F.col("comm").alias("c_dst")))
    internal = (
        edges.join(lab_src, "src")
        .join(lab_dst, "dst")
        .where(F.col("c_src") == F.col("c_dst"))
        .agg(F.sum("w").alias("s"))
        .select(F.lit("internal").alias("part"), "s")
    )
    acc = (
        community_weights(labels, verts)
        .agg(F.sum(F.col("a_c") * F.col("a_c")).alias("s"))
        .select(F.lit("acc").alias("part"), "s")
    )
    parts = {r["part"]: float(r["s"] or 0.0) for r in internal.unionByName(acc).collect()}
    return parts["internal"] / (2 * m) - gamma * parts["acc"] / (4 * m * m)


def singleton_labels(edges: DataFrame) -> DataFrame:
    """commIds[v] = v (reference singleton_partition, graph_cuda.cu:410-446)."""
    return edges.select(F.col("src").alias("v")).distinct().withColumn("comm", F.col("v"))


def louvain_move_candidates(
    edges: DataFrame, labels: DataFrame, verts: DataFrame, a_c: DataFrame, m: float,
    gamma: float = 1.0,
) -> DataFrame:
    """Per-vertex best move: (v, cur_comm, best_comm, gain) for every vertex
    with at least one edge in ``edges`` (callers pre-filter to a batch).

    This is the whole inner kernel of the reference
    (graph_cuda.cu:49-121 gather, :2263-2348 mask, thrust sort+reduce,
    :1450-1540 argmax) as one aggregation pipeline.
    """
    state = labels.join(verts.select("v", "k"), "v")
    return _move_candidates_state(edges, state, a_c, m, gamma=gamma)


def _move_candidates_state(
    edges: DataFrame, state: DataFrame, a_c: DataFrame, m: float,
    broadcast_state: bool = False, gamma: float = 1.0,
) -> DataFrame:
    """Inner kernel over the combined (v, comm, k) state table: one V-row
    join attaches (my_comm, k) together, instead of separate labels + verts
    joins. louvain_sweep builds the state once per sweep and maintains it
    through batch updates, saving ~2 V-row joins per batch.

    ``broadcast_state``: statically broadcast the V-row tables. With edges
    pinned hash-partitioned on src (louvain._pin_edges), the WHOLE kernel
    then runs without a single E-row exchange: broadcast joins preserve the
    scan's src-partitioning, which satisfies the clustered distribution of
    both groupBy(src, dst_comm) and groupBy(src). Only safe when the
    current phase's vertex count fits a broadcast (louvain gates it on
    ``broadcast_threshold``); at huge V leave False and AQE localizes the
    join reads instead."""
    bc = F.broadcast if broadcast_state else (lambda df: df)
    w_eff, aggs, sel, pred = _kernel_cols(float(m), float(gamma))
    lab_dst = state.select(F.col("v").alias("dst"), F.col("comm").alias("dst_comm"))
    cand = (
        edges.withColumn("w_eff", w_eff)
        .join(bc(lab_dst), "dst")
        .groupBy("src", "dst_comm")
        .agg(F.sum("w_eff").alias("e_vc"))
    )
    sk = state.select(F.col("v").alias("src"), F.col("comm").alias("my_comm"), "k")
    a_dst = a_c.select(F.col("comm").alias("dst_comm"), F.col("a_c").alias("a_dst"))
    a_my = a_c.select(F.col("comm").alias("my_comm"), F.col("a_c").alias("a_my"))
    scored = (
        cand.join(bc(sk), "src")
        .join(bc(a_dst), "dst_comm")
        .join(bc(a_my), "my_comm")
    )
    return scored.groupBy("src").agg(*aggs).select(*sel).where(pred)


@lru_cache(maxsize=16)
def _kernel_cols(m: float, gamma: float):
    """The batch kernel's Column bundle for a given (m, gamma).

    Columns are UNRESOLVED expressions bound by name, so one bundle is
    reusable across every batch, sweep and phase that shares (m, gamma) —
    and building it costs ~200 py4j round trips, which the sweep loop was
    paying 4x per sweep x sweeps x phases (round 6: ~0.9 s of pure
    expression-construction chatter per sweep at sf0.1). m is constant
    across phases of one run, so a whole louvain()/leiden() run hits one
    cache entry; maxsize bounds concurrent distinct graphs."""
    two_m = 2.0 * m
    w_eff = F.when(F.col("src") == F.col("dst"), F.lit(0.0)).otherwise(F.col("w"))
    gain_col = (
        F.col("e_vc") - F.lit(gamma) * F.col("k") * F.col("a_dst") / F.lit(two_m)
    ) / F.lit(m)
    aggs = (
        F.first("my_comm").alias("cur_comm"),
        F.first("k").alias("k"),
        F.first("a_my").alias("a_my"),
        F.coalesce(
            F.sum(F.when(F.col("dst_comm") == F.col("my_comm"), F.col("e_vc"))), F.lit(0.0)
        ).alias("self_e"),
        F.max(
            F.when(
                F.col("dst_comm") != F.col("my_comm"),
                F.struct(
                    gain_col.alias("gain"),
                    (-F.col("dst_comm")).alias("neg_comm"),
                    F.col("dst_comm").alias("comm"),
                ),
            )
        ).alias("best"),
    )
    self_term = (
        F.col("self_e")
        - F.lit(gamma) * F.col("k") * (F.col("a_my") - F.col("k")) / F.lit(two_m)
    ) / F.lit(m)
    sel = (
        F.col("src").alias("v"),
        F.col("cur_comm").alias("cur_comm"),
        F.col("best.comm").alias("best_comm"),
        (F.col("best.gain") - self_term).alias("gain"),
    )
    return w_eff, aggs, sel, F.col("best_comm").isNotNull()


def louvain_sweep(
    edges: DataFrame,
    labels: DataFrame,
    verts: DataFrame,
    m: float,
    nbatches: int,
    kernel: str = "sql",
    broadcast_state: bool = False,
    gamma: float = 1.0,
) -> DataFrame:
    """One block-synchronous sweep over all batches; returns new labels DF.

    Batch b processes vertices with ``pmod(src, nbatches) == b``; its argmax
    sees labels/community-weights updated by batches < b (reference:
    louvain_gpu.cpp:61-82).

    ``kernel``: 'sql' (Tungsten max_by aggregate) or 'arrow' (vectorized
    pandas-UDF segment argmax over vertex blocks, kernels.py) — identical
    semantics, benchmarked against each other in bench.py.

    The iterative state is the combined (v, comm, k) table, built with ONE
    V-row join at sweep start and carried through batch updates: per-batch
    community weights are then a bare groupBy (no labels-x-verts join) and
    the candidate scoring attaches (my_comm, k) in one join instead of two
    — ~2 fewer V-row joins per batch x nbatches x sweeps.
    """
    if kernel == "arrow":
        from nido_spark.kernels import louvain_move_candidates_arrow_state as cand_fn
    else:
        cand_fn = _move_candidates_state
    bc = F.broadcast if broadcast_state else (lambda df: df)
    state = truncate_lineage(
        labels.join(verts.select("v", "k"), "v"), eager=False
    )
    for b in range(nbatches):
        a_c = state.groupBy("comm").agg(F.sum("k").alias("a_c"))
        batch_edges = (
            edges if nbatches == 1 else edges.where(F.pmod(F.col("src"), F.lit(nbatches)) == b)
        )
        moves = (
            cand_fn(
                batch_edges, state, a_c, m,
                broadcast_state=broadcast_state, gamma=gamma,
            )
            .where(F.col("gain") > 0)
            .select("v", F.col("best_comm").alias("new_comm"))
        )
        state = (
            state.join(bc(moves), "v", "left")
            .select("v", F.coalesce("new_comm", "comm").alias("comm"), "k")
        )
        # truncate per-batch lineage; lazy — materializes inside the next
        # batch's (or the Q evaluation's) job instead of costing its own
        state = truncate_lineage(state, eager=False)
    return state.select("v", "comm")


def coarsen(edges: DataFrame, labels: DataFrame, broadcast_labels: bool = False) -> DataFrame:
    """Contract communities into super-vertices; sum parallel edges; keep
    intra-community weight as self-loops (graph_gpu.cpp:1224-1304). Community
    ids (sparse vertex ids) become the new vertex ids. ``broadcast_labels``
    (same vertex-count gate as the sweep) makes the contraction's only
    E-row exchange the final groupBy."""
    bc = F.broadcast if broadcast_labels else (lambda df: df)
    lab_src = bc(labels.select(F.col("v").alias("src"), F.col("comm").alias("c_src")))
    lab_dst = bc(labels.select(F.col("v").alias("dst"), F.col("comm").alias("c_dst")))
    return (
        edges.join(lab_src, "src")
        .join(lab_dst, "dst")
        .groupBy(F.col("c_src").alias("src"), F.col("c_dst").alias("dst"))
        .agg(F.sum("w").alias("w"))
    )


@dataclass
class LouvainRunResult:
    labels: DataFrame               # (v, comm) over original vertices
    modularity: float
    n_phases: int
    total_sweeps: int
    history: list[dict] = field(default_factory=list)


def dense_relabel_map(new_edges: DataFrame) -> DataFrame:
    """(old, new): order-preserving dense ids 0..ncomm-1 for a coarsened
    edge table's vertex set (reference C1, graph_gpu.cpp:1151-1222).

    Costs one global sort of the COMMUNITY set (post-coarsen V rows, which
    shrink geometrically per phase — never E rows). Order-preserving rank
    means every smallest-comm-id tie-break downstream is unchanged."""
    from pyspark.sql import Window

    comms = new_edges.select(F.col("src").alias("old")).distinct()
    wnd = Window.orderBy("old")
    return comms.select(
        "old", (F.row_number().over(wnd) - 1).cast("long").alias("new")
    )


from contextlib import contextmanager


@contextmanager
def _small_graph_codegen_off(edges: DataFrame, threshold: int):
    """Disable whole-stage codegen for the duration of a small-graph run.

    A multi-phase sweep loop issues dozens of small queries; for each one,
    ``toRdd`` spends 0.6-0.9 s GENERATING codegen source (the compile is
    cached across identical plans, the source generation is not) while the
    interpreted execution of a sub-10M-edge batch costs well under that
    (round-6 measurement: full sf0.1 Louvain 20.2 s with codegen vs 15.4 s
    without, identical Q/sweep trajectory). The same fixed-cost-vs-compute
    crossover as ``local_threshold``, so the gate is the initial edge
    count, not a local-mode switch: on a cluster a sub-threshold phase is
    equally fixed-cost dominated, and any at-scale run (edges >= threshold)
    keeps codegen untouched. Session-scoped conf — concurrent queries in
    OTHER driver threads of the same session would also plan interpreted
    while the loop runs (document-level caveat, same class as the AQE
    toggles a session already owns). 0 disables the gate."""
    spark = edges.sparkSession
    key = "spark.sql.codegen.wholeStage"
    if threshold and edges.count() < threshold:
        prev = spark.conf.get(key)
        spark.conf.set(key, "false")
        try:
            yield
        finally:
            spark.conf.set(key, prev)
    else:
        yield


class _EdgePin:
    """Per-phase edge pinning shared by louvain() and leiden(): pin the
    phase's edge table hash-partitioned on src and persisted — the
    in-memory equivalent of iterating over a src-bucketed at-rest table.
    Every sweep/batch job then reads co-located edges; with
    broadcast_state the batch kernels run with zero E-row exchanges.
    One E-row shuffle per PHASE, amortized over that phase's sweeps.

    Durable mode (durable_prefix): write the phase table src-bucketed at
    rest and iterate over its scan — same partitioning guarantee
    (bucketed scans report hashpartitioning(src)), but the table outlives
    the job for resume/multi-job reuse. The SCAN is persisted too:
    InMemoryTableScan preserves the child FileScan's bucketed
    outputPartitioning, so sweeps keep the zero-exchange plans while
    re-reading memory, not parquet — without this, 28 sweeps re-decode
    the table per batch job (measured 216 s vs 75 s at sf0.1).
    Durability costs ONE write per phase, not a scan per sweep."""

    def __init__(self, durable_prefix: str | None = None,
                 durable_buckets: int | None = None):
        self._prefix = durable_prefix
        self._buckets = durable_buckets
        self._pinned: DataFrame | None = None

    def pin(self, e: DataFrame, phase: int) -> DataFrame:
        spark = e.sparkSession
        p = int(spark.conf.get("spark.sql.shuffle.partitions"))
        if self._prefix is not None:
            from nido_spark.io import write_bucketed_edges

            name = f"{self._prefix}_phase{phase}"
            write_bucketed_edges(e, name, buckets=self._buckets or p)
            newp = spark.table(name).persist()
        else:
            newp = e.repartition(p, "src").persist()
        newp.count()
        if self._pinned is not None:
            self._pinned.unpersist()
        self._pinned = newp
        return newp

    def release(self) -> None:
        if self._pinned is not None:
            self._pinned.unpersist()
            self._pinned = None


def _phase_local_move(
    edges: DataFrame,
    labels: DataFrame,
    verts: DataFrame,
    m: float,
    nbatches: int,
    tol: float,
    max_loops: int,
    kernel: str,
    bcast: bool,
    gamma: float,
    history: list,
    n_phases: int,
) -> tuple[DataFrame, float, float, int]:
    """One level's batched local-move loop, shared by louvain() and
    leiden(): sweep until dQ <= tol or max_loops, rolling back a
    negative-dQ sweep (louvain_gpu.cpp:85-90). Appends per-sweep rows to
    ``history`` in place; returns (labels, Q, Q_phase_start, loops)."""
    Q = modularity(edges, labels, m, verts, broadcast_labels=bcast, gamma=gamma)
    Q_phase_start = Q
    dQ = float("inf")
    loops = 0
    while tol < dQ and loops < max_loops:
        labels_prev = labels
        labels = louvain_sweep(
            edges, labels, verts, m, nbatches, kernel=kernel,
            broadcast_state=bcast, gamma=gamma,
        )
        Qtmp = modularity(
            edges, labels, m, verts, broadcast_labels=bcast, gamma=gamma
        )
        dQ = Qtmp - Q
        loops += 1
        if dQ < 0:
            labels = labels_prev  # rollback (louvain_gpu.cpp:85-90)
        else:
            Q = Qtmp
        history.append(
            {"phase": n_phases, "sweep": loops, "Q": float(Qtmp), "dQ": float(dQ)}
        )
    return labels, Q, Q_phase_start, loops


def louvain(
    edges: DataFrame,
    nbatches: int = 2,
    tol: float = 1e-6,
    max_loops: int = 500,
    tol_phase: float = 1e-6,
    max_phases: int = 200,
    checkpointer=None,
    kernel: str = "sql",
    local_threshold: int = 1_000_000,
    dense_relabel: bool = False,
    broadcast_threshold: int = 8_000_000,
    durable_edges_prefix: str | None = None,
    durable_buckets: int | None = None,
    gamma: float = 1.0,
    init_labels: DataFrame | None = None,
    small_codegen_threshold: int = 10_000_000,
) -> LouvainRunResult:
    """Full multi-phase Louvain. ``edges`` must be the canonical symmetric
    table (normalize_edges). ``checkpointer``: optional
    nido_spark.checkpoint.LouvainCheckpointer for durable resume.

    ``init_labels``: optional (v, comm) warm start applied at PHASE 0
    instead of the singleton partition — the incremental re-clustering
    path (re-run after streaming.IncrementalEdgeStore folds an edge
    batch, seeded with yesterday's labels; the pagerank ``init_ranks`` /
    ``incremental_cc`` convention for the community family). Vertices
    missing from the mapping stay singletons; labels are canonicalized to
    the min member id per community (the engine-portable representative,
    same convention as ``leiden``), so any labeling works. Ignored when a
    checkpointer resume supersedes phase 0. Same fixpoint semantics: a
    warm start changes the trajectory, not the contract, and the NumPy
    oracle accepts the same ``init_ids`` for exact replay.

    ``gamma``: Reichardt-Bornholdt resolution parameter (the standard
    Louvain knob the reference binary lacks but cuGraph's public
    ``louvain(resolution=...)`` exposes): the gain and modularity null-model
    terms are scaled by gamma, so gamma > 1 favors more/smaller communities
    and gamma < 1 fewer/larger; 1.0 is classic Newman-Girvan modularity and
    reproduces the reference trajectory bit-for-bit. Applied identically in
    the SQL kernel, the Arrow kernel, and the NumPy oracle (including the
    ``local_threshold`` tail), so parity tests hold at any gamma.

    ``dense_relabel``: renumber super-vertices densely (0..ncomm-1) at every
    phase transition — the reference's C1 kernel. Sparse 64-bit ids stay
    correct without it (the round-1 documented deviation), but on deep
    dendrograms dense ids keep join keys compact and make the batched
    ``pmod(v, nbatches)`` schedule balanced regardless of the id
    distribution. Changes the trajectory only through batch membership; the
    NumPy oracle supports the same flag, and parity is asserted either way.

    ``local_threshold``: hybrid tail execution — when a phase's coarsened
    edge table has <= this many rows, the remaining dendrogram is finished
    on the driver with the NumPy oracle (oracle.py implements the *same*
    batched schedule, so results are identical by construction; asserted by
    tests at both settings). Coarsening shrinks the graph geometrically, so
    at any scale the tail phases are tiny — distributing them wastes more
    time scheduling stages than the arithmetic costs. 0 disables.

    Default sizing (measured, round 6): one distributed sweep has a
    ~1.7-2.5 s driver-latency floor (Catalyst planning + codegen + per-batch
    lineage truncation) regardless of edge count, while a NumPy sweep over a
    1M-edge phase runs in well under that, so any coarsened phase below ~1M
    edges is fixed-cost dominated and belongs on the driver. Memory bound:
    1M edge rows collect to ~24 MB of pandas — trivial for any driver. At
    sf0.1 this moves the 679k-edge phase-1 (22 of 28 sweeps) local and cut
    the full run ~4x with bit-identical labels/Q/history (parity-asserted).

    ``broadcast_threshold``: when a phase's vertex count is at or below
    this, the sweep statically broadcasts the V-row state/label tables.
    Sizing: 8M (v, comm, k) rows build a ~300-400 MB HashedRelation —
    sized for 4-8 GB executors; lower the threshold on memory-tight
    clusters (above it nothing breaks, the sweep just falls back to
    AQE-planned shuffle joins).
    Combined with the per-phase edge pinning (hash-partitioned on src,
    persisted — the in-memory rendering of a src-bucketed at-rest table;
    io.write_bucketed_edges is the durable variant), every batch kernel
    then runs with ZERO E-row exchanges: broadcast joins preserve the
    cached scan's src-partitioning, which already satisfies both
    groupBy(src, dst_comm) and groupBy(src). Above the threshold (huge-V
    cluster phases) the sweep falls back to AQE-planned joins.

    ``durable_edges_prefix``: when set, each phase's edge table is written
    to the src-bucketed parquet table ``{prefix}_phase{n}``
    (io.write_bucketed_edges) and the phase iterates directly over that
    table's scan instead of an in-memory repartition — the bucketed scan
    reports hashpartitioning(src), so the sweeps keep their zero-exchange
    plans (pytest-pinned) while the edge table survives the job: a
    resumed or multi-job deployment re-opens the table and skips the
    per-phase shuffle entirely. Costs one parquet write per phase; the
    in-memory pin (default) is right for single-job runs.
    ``durable_buckets`` defaults to spark.sql.shuffle.partitions — keep it
    equal across jobs so bucket alignment holds on re-open.

    ``small_codegen_threshold``: below this initial edge count, whole-stage
    codegen is disabled for the duration of the run (restored after) — the
    sweep loop's many small queries pay more in per-query codegen source
    generation than interpreted execution costs at that size; identical
    results either way (see ``_small_graph_codegen_off``).
    """
    edges = truncate_lineage(edges)
    flat = singleton_labels(edges)  # orig vertex -> current super-vertex
    flat = truncate_lineage(flat)

    m_first = G.mass(edges)  # reused by phase 0 below — one E-scan, not two
    if m_first <= 0.0:  # empty / all-nonpositive input: nothing to do
        return LouvainRunResult(flat, 0.0, 0, 0, [])

    with _small_graph_codegen_off(edges, small_codegen_threshold):
        return _louvain_loop(
            edges, flat, m_first, nbatches, tol, max_loops, tol_phase,
            max_phases, checkpointer, kernel, local_threshold, dense_relabel,
            broadcast_threshold, durable_edges_prefix, durable_buckets,
            gamma, init_labels,
        )


def _louvain_loop(
    edges, flat, m_first, nbatches, tol, max_loops, tol_phase, max_phases,
    checkpointer, kernel, local_threshold, dense_relabel,
    broadcast_threshold, durable_edges_prefix, durable_buckets, gamma,
    init_labels,
) -> LouvainRunResult:

    history: list[dict] = []
    total_sweeps = 0
    Q_final = 0.0
    n_phases = 0
    done = False

    start_phase = 0
    if checkpointer is not None:
        resumed = checkpointer.resume(edges.sparkSession)
        if resumed is not None:
            edges, flat, start_phase, history = resumed
            total_sweeps = sum(1 for h in history)
            n_phases = start_phase
            m_first = None  # edges replaced — recompute mass in the loop

    pin = _EdgePin(durable_edges_prefix, durable_buckets)

    while not done and n_phases < max_phases:
        warm = init_labels if (n_phases == 0 and start_phase == 0) else None
        if local_threshold and edges.count() <= local_threshold:
            res = _finish_local(
                edges, flat, n_phases, total_sweeps, history,
                nbatches, tol, max_loops, tol_phase, max_phases, checkpointer,
                dense_relabel, gamma=gamma, init_labels=warm,
            )
            pin.release()
            return res
        edges = pin.pin(edges, n_phases)
        verts = truncate_lineage(G.vertices(edges))
        nv = verts.count()
        bcast = nv <= broadcast_threshold
        # mass is invariant across phases, but per-phase recompute keeps the
        # FP provenance identical to the NumPy oracle (which re-sums the
        # coarsened weights); only the duplicate phase-0 scan is skipped
        m = m_first if m_first is not None else G.mass(edges)
        m_first = None
        if warm is not None:
            # canonical warm start: min member id per init community;
            # vertices missing from the mapping stay singletons
            cover = verts.select("v").join(
                warm.select("v", "comm"), "v", "left"
            ).select("v", F.coalesce("comm", F.col("v")).alias("comm"))
            canon = cover.groupBy("comm").agg(F.min("v").alias("rep"))
            labels = truncate_lineage(
                cover.join(
                    F.broadcast(canon) if bcast else canon, "comm"
                ).select("v", F.col("rep").alias("comm"))
            )
        else:
            labels = truncate_lineage(singleton_labels(edges))
        labels, Q, Q_phase_start, loops = _phase_local_move(
            edges, labels, verts, m, nbatches, tol, max_loops, kernel,
            bcast, gamma, history, n_phases,
        )
        total_sweeps += loops
        Q_final = Q

        # project into flat clustering: flat.comm is a vertex of this phase.
        # phase_map is CURRENT-phase V rows (small, shrinking) while flat is
        # ORIGINAL-graph V rows — broadcast the small side under the gate so
        # the projection never shuffles the original vertex set
        phase_map = labels.select(
            F.col("v").alias("phase_v"), F.col("comm").alias("new_comm")
        )
        if bcast:
            phase_map = F.broadcast(phase_map)
        flat = truncate_lineage(
            flat.join(phase_map, flat["comm"] == phase_map["phase_v"])
            .select("v", F.col("new_comm").alias("comm"))
        )

        if Q - Q_phase_start > tol_phase:
            new_edges = truncate_lineage(
                coarsen(edges, labels, broadcast_labels=bcast)
            )
            if dense_relabel:
                relab = truncate_lineage(dense_relabel_map(new_edges))
                r_src = relab.select(F.col("old").alias("src"), F.col("new").alias("nsrc"))
                r_dst = relab.select(F.col("old").alias("dst"), F.col("new").alias("ndst"))
                new_edges = truncate_lineage(
                    new_edges.join(r_src, "src").join(r_dst, "dst")
                    .select(
                        F.col("nsrc").alias("src"), F.col("ndst").alias("dst"), "w"
                    )
                )
                flat = truncate_lineage(
                    flat.join(relab, flat["comm"] == relab["old"])
                    .select("v", F.col("new").alias("comm"))
                )
            n_comms = new_edges.select("src").distinct().count()
            edges = new_edges
            if n_comms == nv or n_comms <= 1:
                done = True
        else:
            done = True
        n_phases += 1

        if checkpointer is not None:
            checkpointer.save_phase(n_phases, edges, flat, history, done)

    pin.release()
    return LouvainRunResult(flat, float(Q_final), n_phases, total_sweeps, history)


def _finish_local(
    edges: DataFrame,
    flat: DataFrame,
    n_phases: int,
    total_sweeps: int,
    history: list[dict],
    nbatches: int,
    tol: float,
    max_loops: int,
    tol_phase: float,
    max_phases: int,
    checkpointer,
    dense_relabel: bool = False,
    gamma: float = 1.0,
    init_labels: DataFrame | None = None,
) -> LouvainRunResult:
    """Finish the dendrogram tail on the driver via the NumPy oracle
    (identical schedule/semantics; see louvain(local_threshold=...)).
    ``init_labels`` (phase-0 warm start only) is collected here — the
    tail triggers only below local_threshold, so the vertex set is
    driver-sized by construction."""
    from nido_spark.oracle import louvain_numpy

    spark = edges.sparkSession
    pdf = edges.toPandas()
    init_ids = None
    if init_labels is not None:
        init_ids = {
            int(r["v"]): int(r["comm"])
            for r in init_labels.select("v", "comm").collect()
        }
    res = louvain_numpy(
        pdf["src"].to_numpy(), pdf["dst"].to_numpy(), pdf["w"].to_numpy(),
        nbatches=nbatches, tol=tol, max_loops=max_loops,
        tol_phase=tol_phase, max_phases=max_phases - n_phases,
        dense_relabel=dense_relabel, gamma=gamma, init_ids=init_ids,
    )
    for h in res.history:
        history.append({**h, "phase": h["phase"] + n_phases})
    mapping = spark.createDataFrame(
        list(res.labels.items()), "phase_v long, new_comm long"
    )
    flat = truncate_lineage(
        flat.join(F.broadcast(mapping), flat["comm"] == mapping["phase_v"])
        .select("v", F.col("new_comm").alias("comm"))
    )
    out = LouvainRunResult(
        flat, res.modularity, n_phases + res.n_phases,
        total_sweeps + res.total_sweeps, history,
    )
    if checkpointer is not None:
        final_edges = spark.createDataFrame(
            [
                (int(s), int(d), float(w))
                for s, d, w in zip(pdf["src"], pdf["dst"], pdf["w"])
            ],
            "src long, dst long, w double",
        )
        checkpointer.save_phase(out.n_phases, final_edges, flat, history, True)
    return out


def community_stats(
    edges: DataFrame,
    labels: DataFrame,
    m: float | None = None,
    broadcast_labels: bool = False,
) -> DataFrame:
    """Per-community partition-quality metrics over the canonical symmetric
    edge table: ``(comm, n_vertices, volume, internal_w, cut_w,
    conductance)`` — the post-pass a Louvain/Leiden user runs to judge the
    labeling the optimizer produced (the reference only reports global Q,
    louvain_gpu.cpp:116; per-community diagnostics are the standard
    companion).

    Definitions (weights; symmetric-table conventions as in ``modularity``):

    - ``volume``      — sum of w over rows with src in the community
                        (= sum of member weighted degrees k_v; self-loops
                        count once, matching ``graph.vertices``).
    - ``internal_w``  — total weight of edges with BOTH endpoints inside:
                        non-self edges count once (they appear twice in the
                        symmetric table and are halved), self-loops once.
    - ``cut_w``       — total weight of edges with exactly one endpoint
                        inside (each cross edge appears once per side's row).
    - ``conductance`` — cut_w / min(volume, total_volume - volume), the
                        standard normalized-cut score; NULL when the
                        denominator is 0 (a community holding the whole
                        volume, or an isolated-self-loop community).

    Invariants the pytest pins: volume = 2*internal_w - self_w + cut_w and
    sum(volume) = 2m; conductance in [0, 1] wherever defined.

    Plan: two label joins on the edge table (V-row side broadcast under
    ``broadcast_labels``, same gate convention as the sweep kernel), ONE
    grouped aggregation of E rows, one V-row size aggregation, one join —
    no driver state beyond the optional scalar m (computed in one pass if
    not supplied). Hub communities are single fat-but-spillable reduce
    keys; AQE skew split applies."""
    if m is None:
        m = G.mass(edges)
    total_vol = 2.0 * m
    bc = F.broadcast if broadcast_labels else (lambda df: df)
    lab_src = bc(labels.select(F.col("v").alias("src"), F.col("comm").alias("c_src")))
    lab_dst = bc(labels.select(F.col("v").alias("dst"), F.col("comm").alias("c_dst")))
    j = edges.join(lab_src, "src").join(lab_dst, "dst")
    same = F.col("c_src") == F.col("c_dst")
    self_ = F.col("src") == F.col("dst")
    per = j.groupBy(F.col("c_src").alias("comm")).agg(
        F.sum("w").alias("volume"),
        F.sum(F.when(same & ~self_, F.col("w")).otherwise(F.lit(0.0))).alias("same_w"),
        F.sum(F.when(same & self_, F.col("w")).otherwise(F.lit(0.0))).alias("self_w"),
        F.sum(F.when(~same, F.col("w")).otherwise(F.lit(0.0))).alias("cut_w"),
    )
    sizes = labels.groupBy("comm").agg(F.count(F.lit(1)).alias("n_vertices"))
    denom = F.least(F.col("volume"), F.lit(total_vol) - F.col("volume"))
    return (
        sizes.join(per, "comm", "left")
        .select(
            "comm",
            "n_vertices",
            F.coalesce("volume", F.lit(0.0)).alias("volume"),
            (
                F.coalesce("same_w", F.lit(0.0)) / 2.0
                + F.coalesce("self_w", F.lit(0.0))
            ).alias("internal_w"),
            F.coalesce("cut_w", F.lit(0.0)).alias("cut_w"),
        )
        .withColumn(
            "conductance",
            F.when(denom > 0, F.col("cut_w") / denom).otherwise(F.lit(None)),
        )
    )


def partition_agreement(a: DataFrame, b: DataFrame) -> DataFrame:
    """One-row (n, n_comms_a, n_comms_b, ari, nmi) — agreement between two
    labelings of the same vertex set (each ``(v, comm)``), label-invariant:
    the quantitative form of the north rule's "labels exact up to
    relabeling" acceptance criterion (ARI = NMI = 1.0 iff the partitions
    are identical up to renaming). Standard definitions: Adjusted Rand
    Index (Hubert & Arabie 1985) over pair counts C(n,2), and NMI with
    sqrt(H(A)*H(B)) normalization (natural log), the sklearn default.
    Use it to compare a Louvain run against a reference labeling, two
    gamma settings, or LPA vs Louvain. Both scores rounded to 9 dp.

    100 TB shape: ONE V-row equi-join on v, one grouped aggregation to the
    contingency table (O(communities^2) worst case but O(matched pairs)
    rows in practice — each vertex contributes one cell), marginals and
    entropies reduce the contingency rows, and the final algebra runs on
    a handful of one-row DataFrames (broadcast-joined scalars, no
    collect). Vertices present in only one labeling are dropped by the
    inner join (count them upstream if that matters)."""
    pa = a.select("v", F.col("comm").alias("ca"))
    pb = b.select("v", F.col("comm").alias("cb"))
    cont = (
        pa.join(pb, "v")
        .groupBy("ca", "cb")
        .agg(F.count(F.lit(1)).cast("double").alias("nij"))
    )

    def comb2(c):
        return c * (c - F.lit(1.0)) / F.lit(2.0)

    row = cont.groupBy("ca").agg(F.sum("nij").alias("ai"))
    col = cont.groupBy("cb").agg(F.sum("nij").alias("bj"))
    s_ij = cont.agg(
        F.sum(comb2(F.col("nij"))).alias("s_ij"),
        F.sum("nij").alias("n"),
    )
    s_a = row.agg(
        F.sum(comb2(F.col("ai"))).alias("s_a"),
        F.count(F.lit(1)).cast("long").alias("n_comms_a"),
    )
    s_b = col.agg(
        F.sum(comb2(F.col("bj"))).alias("s_b"),
        F.count(F.lit(1)).cast("long").alias("n_comms_b"),
    )
    # mutual information and marginal entropies (natural log, p = x/n)
    with_m = (
        cont.join(F.broadcast(row), "ca")
        .join(F.broadcast(col), "cb")
        .crossJoin(F.broadcast(s_ij.select("n")))
    )
    mi = with_m.agg(
        F.sum(
            (F.col("nij") / F.col("n"))
            * F.log(F.col("n") * F.col("nij") / (F.col("ai") * F.col("bj")))
        ).alias("mi")
    )
    ha = row.crossJoin(F.broadcast(s_ij.select("n"))).agg(
        (-F.sum((F.col("ai") / F.col("n")) * F.log(F.col("ai") / F.col("n"))))
        .alias("ha")
    )
    hb = col.crossJoin(F.broadcast(s_ij.select("n"))).agg(
        (-F.sum((F.col("bj") / F.col("n")) * F.log(F.col("bj") / F.col("n"))))
        .alias("hb")
    )
    scalars = (
        s_ij.crossJoin(s_a).crossJoin(s_b)
        .crossJoin(mi).crossJoin(ha).crossJoin(hb)
    )
    t = comb2(F.col("n"))
    expected = F.col("s_a") * F.col("s_b") / t
    max_idx = (F.col("s_a") + F.col("s_b")) / F.lit(2.0)
    ari = F.when(
        max_idx - expected == 0, F.lit(1.0)  # both trivial partitions
    ).otherwise((F.col("s_ij") - expected) / (max_idx - expected))
    nmi = F.when(
        (F.col("ha") == 0) | (F.col("hb") == 0),
        # convention: a constant labeling agrees perfectly only with
        # another constant labeling (then MI = H = 0 and we define 1.0)
        F.when((F.col("ha") == 0) & (F.col("hb") == 0), F.lit(1.0)).otherwise(
            F.lit(0.0)
        ),
    ).otherwise(F.col("mi") / F.sqrt(F.col("ha") * F.col("hb")))
    return scalars.select(
        F.col("n").cast("long").alias("n"),
        "n_comms_a",
        "n_comms_b",
        F.round(ari, 9).alias("ari"),
        F.round(nmi, 9).alias("nmi"),
    )


def resolution_profile(
    edges: DataFrame,
    gammas: list[float],
    algorithm: str = "louvain",
    **louvain_kwargs,
) -> list[dict]:
    """Resolution landscape: run ``louvain`` at each gamma (ascending) and
    report per-gamma ``{gamma, modularity, n_comms, n_phases, total_sweeps,
    ari_vs_prev, nmi_vs_prev}`` where ari/nmi compare each partition to the
    previous gamma's (``partition_agreement``; None for the first). Stable
    plateaus — consecutive gammas with agreement ~1.0 — are the standard
    heuristic for a robust community scale (Reichardt-Bornholdt / Lancichinetti
    resolution-sweep practice); a gamma where agreement collapses marks a
    structural transition.

    Driver-side loop over a HANDFUL of gammas, each a full distributed
    run — cost is len(gammas) runs, so keep the list short (3-8).
    Labels of each run are lineage-truncated before the comparison join.

    ``algorithm``: "louvain" (default) or "leiden" — the sweep under test;
    leiden profiles additionally carry its connectivity guarantee into
    every row, which stabilizes the agreement scores on plateau edges."""
    if algorithm not in ("louvain", "leiden"):
        raise ValueError(f"resolution_profile: unknown algorithm {algorithm!r}")
    run = louvain if algorithm == "louvain" else leiden
    out: list[dict] = []
    prev_labels = None
    for gamma in sorted(float(g) for g in gammas):
        res = run(edges, gamma=gamma, **louvain_kwargs)
        labels = truncate_lineage(res.labels)
        row = {
            "gamma": gamma,
            "modularity": res.modularity,
            "n_comms": labels.select("comm").distinct().count(),
            "n_phases": res.n_phases,
            "total_sweeps": res.total_sweeps,
            "ari_vs_prev": None,
            "nmi_vs_prev": None,
        }
        if prev_labels is not None:
            agree = partition_agreement(prev_labels, labels).first()
            row["ari_vs_prev"] = float(agree["ari"])
            row["nmi_vs_prev"] = float(agree["nmi"])
        out.append(row)
        prev_labels = labels
    return out


def ecg_weights(
    edges: DataFrame,
    ensemble_nbatches: tuple[int, ...] = (1, 2, 3, 4, 6, 8, 12, 16),
    min_weight: float = 0.05,
    gamma: float = 1.0,
    broadcast_threshold: int = 8_000_000,
    with_votes: bool = False,
) -> DataFrame:
    """Co-association reweighted edge table (src, dst, w) for ECG (Poulin &
    Théberge, "Ensemble clustering for graphs", 2018; cuGraph exposes the
    same operator as ``ecg``). Each ensemble member is one LEVEL-1 Louvain
    pass (single phase, no coarsening); members differ by their batch
    schedule (``ensemble_nbatches``) rather than random vertex orders — the
    deterministic analogue of the paper's randomized sweeps, so every
    member is exactly replayable by the NumPy oracle (pytest-pinned). An
    edge's vote fraction is the share of members that co-cluster its
    endpoints; following the paper, votes count only on 2-CORE edges
    (pendant edges get the floor — their membership is noise):

        w'(e) = w(e) * (min_weight + (1 - min_weight) * votes/k)   [2-core]
        w'(e) = w(e) * min_weight                                  [else]

    (the original is unweighted; scaling the input weight keeps weighted
    tables meaningful and reduces to the paper on unit weights).

    100 TB shape: k level-1 Louvain runs (each the engine's own bounded
    sweep pipeline), then per member ONE V-row label join pair onto the
    edge table (broadcast under the same gate as the sweep kernel),
    lineage-truncated per member; the 2-core flag is one k_core run + two
    semi-join-shaped left joins. Nothing new shuffles E rows beyond the
    k+1 label attachments."""
    from nido_spark.algos import k_core

    k = len(ensemble_nbatches)
    if k == 0:
        raise ValueError("ensemble_nbatches must be non-empty")
    nv = edges.select("src").distinct().count()
    bc = F.broadcast if nv <= broadcast_threshold else (lambda df: df)

    acc = edges.select("src", "dst", "w", F.lit(0).alias("votes"))
    for nb in ensemble_nbatches:
        labels = louvain(
            edges, nbatches=nb, max_phases=1, local_threshold=0, gamma=gamma
        ).labels
        lab_s = labels.select(F.col("v").alias("src"), F.col("comm").alias("cs"))
        lab_d = labels.select(F.col("v").alias("dst"), F.col("comm").alias("cd"))
        acc = truncate_lineage(
            acc.join(bc(lab_s), "src")
            .join(bc(lab_d), "dst")
            .select(
                "src",
                "dst",
                "w",
                (
                    F.col("votes")
                    + (F.col("cs") == F.col("cd")).cast("int")
                ).alias("votes"),
            )
        )
    core2 = k_core(edges).where(F.col("core") >= 2).select("v")
    c_s = core2.select(F.col("v").alias("src"), F.lit(1).alias("in2_s"))
    c_d = core2.select(F.col("v").alias("dst"), F.lit(1).alias("in2_d"))
    flagged = (
        acc.join(bc(c_s), "src", "left").join(bc(c_d), "dst", "left")
    )
    frac = F.col("votes") / F.lit(float(k))
    w_core = F.lit(min_weight) + F.lit(1.0 - min_weight) * frac
    both_core = F.col("in2_s").isNotNull() & F.col("in2_d").isNotNull()
    cols = [
        F.col("src"),
        F.col("dst"),
        (
            F.col("w") * F.when(both_core, w_core).otherwise(F.lit(min_weight))
        ).alias("w"),
    ]
    if with_votes:
        # diagnostic integer surface: the ensemble trajectory (votes) and
        # the 2-core mask, exact across engines — the driver gate pins the
        # whole distributed ensemble on these without any float ulp risk
        cols += [
            F.col("votes").cast("long").alias("votes"),
            both_core.cast("int").alias("in_2core"),
        ]
    return flagged.select(*cols)


def ecg(
    edges: DataFrame,
    ensemble_nbatches: tuple[int, ...] = (1, 2, 3, 4, 6, 8, 12, 16),
    min_weight: float = 0.05,
    gamma: float = 1.0,
    broadcast_threshold: int = 8_000_000,
    **final_kwargs,
) -> "LouvainRunResult":
    """Ensemble Clustering for Graphs: final Louvain over the
    ``ecg_weights`` co-association reweighted table. More stable than a
    single Louvain run (ensemble votes wash out batch-schedule artifacts)
    at the cost of len(ensemble_nbatches)+1 level runs; ``final_kwargs``
    pass through to the final ``louvain`` (nbatches, tol, checkpointer,
    ...). The returned modularity is measured ON THE REWEIGHTED graph."""
    reweighted = truncate_lineage(
        ecg_weights(
            edges,
            ensemble_nbatches=ensemble_nbatches,
            min_weight=min_weight,
            gamma=gamma,
            broadcast_threshold=broadcast_threshold,
        )
    )
    return louvain(reweighted, gamma=gamma, **final_kwargs)


def leiden(
    edges: DataFrame,
    nbatches: int = 2,
    tol: float = 1e-6,
    max_loops: int = 500,
    tol_phase: float = 1e-6,
    max_phases: int = 200,
    kernel: str = "sql",
    broadcast_threshold: int = 8_000_000,
    gamma: float = 1.0,
    durable_edges_prefix: str | None = None,
    durable_buckets: int | None = None,
    small_codegen_threshold: int = 10_000_000,
) -> LouvainRunResult:
    """Deterministic Leiden (Traag et al. 2019): Louvain's batched local-
    move phase per level, then (the two Leiden deltas) REFINEMENT of the
    level's communities into their connected components — the published
    guarantee Louvain lacks — and aggregation on the REFINED partition
    with the next level warm-started from the parent coarse communities
    (so a badly-merged community can be re-split across levels instead of
    being frozen into one super-vertex). The paper's randomized
    refinement is rendered as the connected split (the piece that carries
    the guarantee), keeping every trajectory exactly replayable by
    ``oracle.leiden_numpy`` — the determinism convention of the whole
    engine. Returned labels are the final level's COARSE partition
    projected to original vertices; every community is connected
    (test-pinned via a refine-fixpoint check).

    100 TB shape: identical to ``louvain`` per level (pinned src-
    partitioned edges, broadcast-gated V-row state, one aggregation per
    batch) plus, per level, ONE intra-community CC run (refine_connected:
    label-broadcast join + min-label propagation over the shrinking
    level graph) and the same coarsen groupBy — both on the level graph,
    which shrinks geometrically. Warm-start labels are one V-row groupBy
    (min representative) + one join.

    ``durable_edges_prefix`` / ``durable_buckets``: same durable
    src-bucketed per-level edge tables as ``louvain`` (shared _EdgePin).
    ``small_codegen_threshold``: see ``_small_graph_codegen_off``."""
    edges = truncate_lineage(edges)
    flat = truncate_lineage(singleton_labels(edges))   # orig -> level vertex
    final_flat = flat                                  # orig -> coarse comm

    m_first = G.mass(edges)
    if m_first <= 0.0:
        return LouvainRunResult(flat, 0.0, 0, 0, [])

    with _small_graph_codegen_off(edges, small_codegen_threshold):
        return _leiden_loop(
            edges, flat, m_first, nbatches, tol, max_loops, tol_phase,
            max_phases, kernel, broadcast_threshold, gamma,
            durable_edges_prefix, durable_buckets,
        )


def _leiden_loop(
    edges, flat, m_first, nbatches, tol, max_loops, tol_phase, max_phases,
    kernel, broadcast_threshold, gamma, durable_edges_prefix,
    durable_buckets,
) -> LouvainRunResult:
    final_flat = flat
    history: list[dict] = []
    total_sweeps = 0
    Q_final = 0.0
    n_phases = 0
    done = False
    init_labels = None   # (v, comm) warm start for the next level
    pin = _EdgePin(durable_edges_prefix, durable_buckets)

    while not done and n_phases < max_phases:
        edges = pin.pin(edges, n_phases)
        verts = truncate_lineage(G.vertices(edges))
        nv = verts.count()
        bcast = nv <= broadcast_threshold
        m = m_first if m_first is not None else G.mass(edges)
        m_first = None
        labels = truncate_lineage(
            singleton_labels(edges) if init_labels is None else init_labels
        )
        labels, Q, Q_phase_start, loops = _phase_local_move(
            edges, labels, verts, m, nbatches, tol, max_loops, kernel,
            bcast, gamma, history, n_phases,
        )
        total_sweeps += loops
        Q_final = Q
        labels = truncate_lineage(labels)

        # the level's RESULT partition (coarse), projected to originals
        coarse_map = labels.select(
            F.col("v").alias("phase_v"), F.col("comm").alias("new_comm")
        )
        if bcast:
            coarse_map = F.broadcast(coarse_map)
        final_flat = truncate_lineage(
            flat.join(coarse_map, flat["comm"] == coarse_map["phase_v"])
            .select("v", F.col("new_comm").alias("comm"))
        )

        from nido_spark.algos import refine_connected

        refined = truncate_lineage(
            refine_connected(labels, edges,
                             broadcast_threshold=broadcast_threshold)
        )
        ref_map = refined.select(
            F.col("v").alias("phase_v"), F.col("comm").alias("new_comm")
        )
        if bcast:
            ref_map = F.broadcast(ref_map)
        flat_ref = truncate_lineage(
            flat.join(ref_map, flat["comm"] == ref_map["phase_v"])
            .select("v", F.col("new_comm").alias("comm"))
        )

        if Q - Q_phase_start > tol_phase:
            new_edges = truncate_lineage(
                coarsen(edges, refined, broadcast_labels=bcast)
            )
            n_ref = new_edges.select("src").distinct().count()
            # warm start: refined part -> parent coarse community,
            # canonicalized to the min refined-part id per coarse comm
            pair = (
                labels.select("v", F.col("comm").alias("coarse"))
                .join(refined.select("v", F.col("comm").alias("ref")), "v")
                .select("ref", "coarse")
                .distinct()
            )
            reps = pair.groupBy("coarse").agg(F.min("ref").alias("rep"))
            init_labels = truncate_lineage(
                pair.join(F.broadcast(reps) if bcast else reps, "coarse")
                .select(F.col("ref").alias("v"), F.col("rep").alias("comm"))
            )
            edges = new_edges
            flat = flat_ref
            if n_ref == nv or n_ref <= 1:
                done = True
        else:
            done = True
        n_phases += 1

    pin.release()
    return LouvainRunResult(
        final_flat, float(Q_final), n_phases, total_sweeps, history
    )
