"""Graph normalization and vertex aggregates.

Reference analogues (file:line into /root/reference):

- ``normalize_edges``   — load-time canonicalization + symmetric insertion
                          (graph.cpp:63-74, graph.cpp:104-105)
- ``vertices``          — degree / weighted-degree / max-weight scans
                          (neigh_scan graph.cpp:190-199, neigh_scan_weights
                          graph.cpp:201-213, max scan graph.cpp:215-230)
- ``mass``              — m = 0.5 * sum of all edge weights
                          (graph_gpu.cpp:844-860, graph_cuda.cu:1786-1856)
- ``max_order``         — global max degree (graph.cpp:129-135) — in Spark
                          only a skew diagnostic, not a buffer-sizing input
- ``salted_weighted_degree`` — two-stage aggregation for hub vertices;
                          replaces the reference's capacity partitioning
                          (graph_gpu.cpp:362-417) whose job Spark's shuffle
                          already does, except for extreme key skew

All are single map-side-combined shuffles; nothing touches the driver except
the scalar reductions (mass, max_order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mirror_edges(e: DataFrame, self_loops_once: bool = True) -> DataFrame:
    """Materialize both directions of each (src, dst, w) row in ONE pass:
    an explode over a two-struct array instead of a self-union. A union of
    a plan with its swapped projection evaluates the child TWICE (two
    scans — or two full aggregations when the child is a groupBy); the
    explode is a map-side flatMap over a single evaluation, identical
    output multiset. ``self_loops_once`` emits src==dst rows once (the
    canonical-input convention); False mirrors unconditionally (bipartite
    derivations with disjoint id ranges)."""
    fwd = F.struct(F.col("src"), F.col("dst"), F.col("w"))
    rev = F.struct(
        F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("w")
    )
    arr = F.array(fwd, rev)
    if self_loops_once:
        # mirror only when src != dst is definitely TRUE: a null endpoint
        # makes the comparison null, and the union form this replaces
        # (mirror = where(src != dst)) did NOT mirror such rows — keep
        # that semantic exactly (review finding)
        arr = F.when(F.col("src") != F.col("dst"), arr).otherwise(F.array(fwd))
    return e.select(F.explode(arr).alias("_e")).select("_e.src", "_e.dst", "_e.w")


def normalize_edges(edges_one_dir: DataFrame, symmetrize: bool = True) -> DataFrame:
    """Canonical edge table: both directions materialized, duplicate (src,dst)
    weights summed, weights > 0 enforced. Self-loops are kept (the reference
    keeps them too: excluded from Louvain gain, included in modularity).

    Input may be one-directional (a<=b canonical) or already symmetric —
    ``symmetrize=False`` skips the mirror for the latter.
    """
    e = edges_one_dir.select(
        F.col("src").cast("long"), F.col("dst").cast("long"), F.col("w").cast("double")
    )
    if symmetrize:
        e = mirror_edges(e, self_loops_once=True)
    return (
        e.where(F.col("w") > 0)
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )


def vertices(edges: DataFrame) -> DataFrame:
    """Per-vertex aggregates over a symmetric edge table:
    ``(v, k, deg, max_w)`` = weighted degree, degree, max incident weight."""
    return edges.groupBy(F.col("src").alias("v")).agg(
        F.sum("w").alias("k"),
        F.count(F.lit(1)).alias("deg"),
        F.max("w").alias("max_w"),
    )


def mass(edges: DataFrame) -> float:
    """m = total undirected edge weight = 0.5 * sum over the symmetric table."""
    row = edges.agg((F.sum("w") / F.lit(2.0)).alias("m")).first()
    return float(row["m"]) if row["m"] is not None else 0.0


def max_order(edges: DataFrame) -> int:
    """Max degree — skew diagnostic (reference sizes GPU scratch with it)."""
    row = vertices(edges).agg(F.max("deg").alias("mo")).first()
    return int(row["mo"]) if row["mo"] is not None else 0


def salted_weighted_degree(edges: DataFrame, n_salts: int = 16) -> DataFrame:
    """k_v via two-stage (salted) aggregation: partial sums per
    (v, hash(dst)%n_salts) bucket, then final sum per v.

    For a mega-hub vertex (a popular tool at 10^12-turn scale) a single-stage
    groupBy funnels all its edges into one reducer; salting spreads the
    partial aggregation across ``n_salts`` tasks. Spark's map-side combine
    plus AQE usually makes this unnecessary — kept for the extreme-skew path
    and benchmarked against the plain groupBy.
    """
    partial = (
        edges.withColumn("salt", F.pmod(F.xxhash64("dst"), F.lit(n_salts)))
        .groupBy(F.col("src").alias("v"), "salt")
        .agg(F.sum("w").alias("pk"))
    )
    return partial.groupBy("v").agg(F.sum("pk").alias("k"))


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """One-row (n_edges, assortativity) — the degree assortativity
    coefficient (Newman 2002): Pearson correlation of (deg(src),
    deg(dst)) over the directed rows of the symmetric table (each
    undirected edge contributes both orientations, the standard
    convention — networkx degree_assortativity_coefficient semantics).
    Self-loops excluded from both the pair list and the degrees.

    Rendered entirely as exact INTEGER sums (sum deg, sum deg^2, sum
    dx*dy, n) combined in one closed-form ratio — the cross-engine
    bit-stability recipe this repo uses everywhere (incremental
    AVG/STDDEV kernels differ between engines; ratios of integer sums do
    not). One degree aggregation + two broadcastable joins + one scalar
    aggregate; no O(V^2) anything."""
    half = edges.where(F.col("src") != F.col("dst")).select("src", "dst")
    deg = half.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    paired = half.join(
        deg.select(F.col("v").alias("src"), F.col("deg").alias("dx")), "src"
    ).join(deg.select(F.col("v").alias("dst"), F.col("deg").alias("dy")), "dst")
    # decimal(38,0) sums: exact at 10^12 edges x 10^6 degrees (dx*dy sums
    # reach ~1e24, and n*sxy ~1e36 — a long would ANSI-overflow; DuckDB's
    # HUGEINT matches the 128-bit headroom, so the oracle is value-exact
    # with ONE double rounding at the final division)
    dec = "decimal(38,0)"
    s = paired.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(F.col("dx").cast(dec)).alias("sx"),
        F.sum(F.col("dy").cast(dec)).alias("sy"),
        F.sum(F.col("dx").cast(dec) * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy").cast(dec) * F.col("dy")).alias("syy"),
        F.sum(F.col("dx").cast(dec) * F.col("dy")).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return s.select(
        F.col("n").cast("long").alias("n_edges"),
        F.when(den > 0, num / den).otherwise(F.lit(0.0)).alias(
            "assortativity"
        ),
    )


def degree_histogram(edges: DataFrame, n_buckets: int = 32) -> DataFrame:
    """log2-bucketed degree histogram — the skew diagnostic used to decide
    salting / repartitioning. ``(bucket, n_vertices, max_deg_in_bucket)``."""
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    return (
        deg.withColumn("bucket", F.least(F.floor(F.log2("deg")), F.lit(n_buckets)))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vertices"), F.max("deg").alias("max_deg"))
        .orderBy("bucket")
    )


def validate_edges(edges: DataFrame) -> dict:
    """Cheap structural invariants of the canonical edge table. Returns a
    dict of counts; ``asym`` must be 0 (every (u,v) has a matching (v,u)
    with the same weight)."""
    e = edges
    rev = e.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("w").alias("w2")
    )
    asym = (
        e.join(rev, ["src", "dst"], "full")
        .where(
            F.col("w").isNull()
            | F.col("w2").isNull()
            | (F.abs(F.col("w") - F.col("w2")) > 1e-12)
        )
        .count()
    )
    stats = e.agg(
        F.count(F.lit(1)).alias("ne"),
        F.countDistinct("src").alias("nv"),
        F.min("w").alias("min_w"),
    ).first()
    return {
        "ne_directed": stats["ne"],
        "nv": stats["nv"],
        "min_w": stats["min_w"],
        "asym": asym,
    }


def random_walks(
    edges: DataFrame,
    starts,
    length: int,
    seed: int = 42,
    broadcast_threshold: int = 8_000_000,
) -> DataFrame:
    """(start, step, v) — one deterministic random walk of ``length``
    steps from every vertex in ``starts`` (list of ids or single-column
    DataFrame): the DeepWalk/node2vec corpus-generation step of a graph-
    embedding pipeline, made reproducible across engines, partitionings
    and retries by replacing rand() with the engine's shared seeded
    affine mix (pipeline._bucket_col — the same portable hash
    neighbor_sample ranks with). At each step the walker at vertex v
    moves to the out-neighbor minimizing the mix of a (start, v, dst)
    fold with a per-step seed — walkers from different starts decorrelate
    via the start term, successive visits to the same vertex via the step
    term. A walker at a vertex with no out-neighbors stops (its walk
    simply has fewer rows); step 0 is the start itself.

    Scale shape: one E-row join + per-walker argmin per step — state is
    |starts| rows, broadcast-joined against the pinned edge table; walk
    corpora for embedding training run millions of starts, which is
    still V-row-bounded state (broadcast below ``broadcast_threshold``
    walkers, shuffled hash join above). No rand(), no sampling
    shuffle."""
    from nido_spark.pipeline import _bucket_col

    spark = edges.sparkSession
    if isinstance(starts, DataFrame):
        st = starts.select(F.col(starts.columns[0]).cast("long").alias("start")).distinct()
    else:
        ids = sorted({int(v) for v in starts})
        if not ids:
            raise ValueError("random_walks needs a non-empty start set")
        st = spark.createDataFrame([(v,) for v in ids], "start long")
    from nido_spark.plans import truncate_lineage

    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = edges.select("src", "dst").distinct().repartition(nparts, "src").persist()
    verts = e.select(F.col("src").alias("start")).distinct()
    st = st.join(verts, "start", "left_semi")
    cur = truncate_lineage(st.select("start", F.col("start").alias("v")))
    bc = F.broadcast if st.count() <= broadcast_threshold else (lambda df: df)
    out = [cur.select("start", F.lit(0).alias("step"), "v")]
    M20 = 1 << 20
    for step in range(1, length + 1):
        cand = e.join(bc(cur.select("start", F.col("v").alias("src"))), "src")
        # (start, src, dst) folded into < 2^60 (positive 20-bit fields) so
        # the shared mix stays ANSI-safe; per-step seed decorrelates
        # revisits. The fold is a hash, not injective beyond 2^20 ids —
        # all the argmin needs (ties break on dst asc).
        key = (
            (
                F.pmod(F.col("start"), F.lit(M20)) * M20
                + F.pmod(F.col("src"), F.lit(M20))
            )
            * M20
            + F.pmod(F.col("dst"), F.lit(M20))
        )
        ranked = cand.withColumn(
            "_rk", _bucket_col(key, seed + 1_000_003 * step)
        )
        nxt = ranked.groupBy("start").agg(
            F.min(F.struct("_rk", "dst")).alias("m")
        ).select("start", F.col("m.dst").alias("v"))
        cur = truncate_lineage(nxt)
        if cur.limit(1).count() == 0:
            break
        out.append(cur.select("start", F.lit(step).alias("step"), "v"))
    e.unpersist()
    from functools import reduce

    return reduce(lambda a, b: a.unionByName(b), out)


def neighbor_sample(
    edges: DataFrame, fanout: int, seed: int = 42
) -> DataFrame:
    """(src, dst, w) — deterministic per-vertex neighbor sampling: keep at
    most ``fanout`` neighbors per src, chosen by a seeded portable hash
    rank over (src, dst) — the GraphSAGE-style fanout step of a GNN
    training pipeline, reproducible across engines/partitionings (never
    rand()). One hash-partition window per src; the per-task sort is
    bounded by the vertex degree and spills — a mega-hub costs one fat
    task, not a failure (hot-split the src key upstream if that matters).

    The rank hash reuses the engine's ANSI-safe affine mix
    (pipeline._bucket_col — the single shared implementation) over a
    src/dst fold, so ties are measure-zero and
    the selection is a uniform-without-replacement sample per vertex."""
    from pyspark.sql import Window

    # fold (src, dst) into one key for the mix: 30-bit halves packed into
    # < 2^61 — ANSI-safe (pmod(x, 2^30) < 2^30; the product is < 2^60).
    # Injective for ids < 2^30; beyond that it is a hash fold, which is
    # all the rank needs (ties break on dst asc either way).
    key = (
        F.pmod(F.col("src"), F.lit(1 << 30)) * F.lit(1 << 30)
        + F.pmod(F.col("dst"), F.lit(1 << 30))
    )
    from nido_spark.pipeline import _bucket_col

    ranked = edges.withColumn("_rk", _bucket_col(key, seed))
    w = Window.partitionBy("src").orderBy(F.col("_rk").asc(), F.col("dst").asc())
    return (
        ranked.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= fanout)
        .select("src", "dst", "w")
    )



def avg_neighbor_degree(edges: DataFrame) -> DataFrame:
    """(v, deg, avg_nbr_deg) — each vertex's degree and the MEAN degree of
    its neighbors, the per-vertex companion to ``degree_assortativity``
    (networkx ``average_neighbor_degree`` semantics on the undirected
    graph; self-loops excluded from both sides, matching the
    assortativity pair list). Expects the canonical symmetric edge table
    (``normalize_edges``) — on a one-directional input run
    ``mirror_edges`` first.

    Bit-stability recipe as everywhere in this repo: the mean is ONE
    double division of two exact integer sums (count of neighbors, sum of
    their integer degrees), never an incremental AVG kernel — so the
    DuckDB oracle is value-exact. Plan: one degree aggregation + one join
    on dst (broadcastable when V fits the gate) + one groupBy src; at
    10^12 edges this is the same two-exchange shape as the degree scan
    itself, and hub vertices cost one fat-but-spillable reduce key each
    (AQE skew split handles the rest)."""
    half = edges.where(F.col("src") != F.col("dst")).select("src", "dst")
    deg = half.groupBy(F.col("src").alias("v")).agg(F.count(F.lit(1)).alias("deg"))
    nbr = half.join(
        deg.select(F.col("v").alias("dst"), F.col("deg").alias("nbr_deg")), "dst"
    )
    out = nbr.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).alias("deg"),
        F.sum(F.col("nbr_deg").cast("decimal(38,0)")).alias("s"),
    )
    return out.select(
        "v",
        F.col("deg").cast("long").alias("deg"),
        (F.col("s").cast("double") / F.col("deg").cast("double")).alias(
            "avg_nbr_deg"
        ),
    )


def neighbor_feature_mean(
    edges: DataFrame,
    features: DataFrame,
    dim: int,
    id_col: str = "id",
    feat_col: str = "feat",
) -> DataFrame:
    """(v, n_nbrs, nbr_feat) — the elementwise MEAN of each vertex's
    in-neighbor feature vectors: the GraphSAGE-mean AGGREGATE step
    (Hamilton et al. 2017) that follows ``neighbor_sample`` in a GNN
    minibatch pipeline (sample the fanout, then aggregate the sampled
    neighborhood's features; the downstream CONCAT(self, agg) needs no
    graph op). Aggregates over IN-neighbors (edge u->v contributes
    feat(u) to v), which equals "neighbors" on the canonical symmetric
    table; self-loops are excluded. Only vertices with >=1 in-neighbor
    appear. ``dim`` is explicit — no inference scan (the lsh/ivf
    ``.first()`` nit never enters).

    Pure Catalyst, NO explode and NO collect_list: the vector mean is
    decomposed into ``dim`` scalar AVG aggregates inside ONE grouped
    aggregation. Partial map-side combine means the shuffle moves one
    (dst, dim partial sums + count) row per (map partition, dst) pair —
    not E x dim element rows and not per-hub collected arrays, so a
    10^12-edge graph with celebrity vertices shuffles bounded state and
    each hub is one spillable reduce key."""
    f = features.select(
        F.col(id_col).alias("src"), F.col(feat_col).alias("_f")
    )
    e = edges.where(F.col("src") != F.col("dst")).select("src", "dst")
    aggs = [F.count(F.lit(1)).alias("n_nbrs")] + [
        F.avg(F.col("_f")[i].cast("double")).alias(f"_m{i}")
        for i in range(dim)
    ]
    out = e.join(f, "src").groupBy(F.col("dst").alias("v")).agg(*aggs)
    return out.select(
        "v",
        "n_nbrs",
        F.array(*[F.col(f"_m{i}") for i in range(dim)]).alias("nbr_feat"),
    )


def degree_powerlaw_alpha(edges: DataFrame, dmin: int = 2) -> DataFrame:
    """One-row ``(dmin, n_tail, alpha)`` — the continuous maximum-likelihood
    power-law exponent of the degree distribution over vertices with
    deg >= dmin: alpha = 1 + n / SUM(ln(d / (dmin - 0.5))) (Clauset-
    Shalizi-Newman 2009, eq. 3.7 discrete approximation). The standard
    one-number heavy-tail diagnostic for a web-scale link graph — decides
    salting/skew strategy before running anything iterative (BA-shaped
    transcript graphs sit near alpha ~ 2-3). Expects the canonical
    symmetric edge table; self-loops excluded.

    alpha is NULL when fewer than 2 tail vertices qualify (the MLE is
    undefined). One degree aggregation + one filtered scalar reduce; the
    log-sum is the only float, so the oracle replays it term-for-term
    (9 dp absorbs engine libm/sum-order ULPs)."""
    half = edges.where(F.col("src") != F.col("dst")).select("src", "dst")
    deg = half.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    tail = deg.where(F.col("deg") >= dmin)
    return tail.agg(
        F.lit(dmin).cast("long").alias("dmin"),
        F.count(F.lit(1)).alias("n_tail"),
        F.when(
            F.count(F.lit(1)) >= 2,
            F.lit(1.0)
            + F.count(F.lit(1))
            / F.sum(F.log(F.col("deg").cast("double") / F.lit(dmin - 0.5))),
        ).alias("alpha"),
    )


def reciprocity(directed_edges: DataFrame) -> DataFrame:
    """One-row ``(n_directed, n_reciprocal, reciprocity)`` over a DIRECTED
    edge table (``io.transcripts_to_directed_edges`` shape): the fraction of
    distinct non-self directed edges (u,v) whose reverse (v,u) is also
    present — networkx ``overall_reciprocity`` semantics. On conversation
    graphs this measures turn-taking: a high value means actors alternate
    (user<->assistant), a low value means one-way flows (conv->tool fanout).

    Plan: distinct non-self pairs, one self-join against the swapped
    projection (left join + flag, so BOTH counts come from one aggregation
    over one joined relation — no second job), one scalar-free one-row
    aggregate. Both sides of the join are the same distinct pair set hash-
    partitioned on (src, dst) vs (dst, src) — a plain shuffle join at any
    scale, no driver state. The ratio is ONE double division of two exact
    integer counts (bit-stable cross-engine, the repo-wide recipe)."""
    e = (
        directed_edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    rev = e.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), F.lit(1).alias("has_rev")
    )
    j = e.join(rev, ["src", "dst"], "left")
    return j.agg(
        F.count(F.lit(1)).alias("n_directed"),
        F.coalesce(F.sum("has_rev"), F.lit(0)).cast("long").alias("n_reciprocal"),
    ).select(
        "n_directed",
        "n_reciprocal",
        F.when(
            F.col("n_directed") > 0,
            F.col("n_reciprocal").cast("double")
            / F.col("n_directed").cast("double"),
        ).otherwise(F.lit(0.0)).alias("reciprocity"),
    )


def in_out_degree(directed_edges: DataFrame) -> DataFrame:
    """(v, out_deg, out_w, in_deg, in_w) per vertex of a DIRECTED edge table —
    the directed companion of ``vertices``. Self-loops count on both sides
    (standard directed-degree convention). Missing sides coalesce to 0 via a
    full outer join of the two single-shuffle aggregations; counts are exact
    longs, weight sums doubles."""
    out_d = directed_edges.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).alias("out_deg"), F.sum("w").alias("out_w")
    )
    in_d = directed_edges.groupBy(F.col("dst").alias("v")).agg(
        F.count(F.lit(1)).alias("in_deg"), F.sum("w").alias("in_w")
    )
    return out_d.join(in_d, "v", "full").select(
        "v",
        F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg"),
        F.coalesce("out_w", F.lit(0.0)).alias("out_w"),
        F.coalesce("in_deg", F.lit(0)).cast("long").alias("in_deg"),
        F.coalesce("in_w", F.lit(0.0)).alias("in_w"),
    )


def project_bipartite(
    pairs: DataFrame,
    key_col: str = "key",
    item_col: str = "item",
    max_items_per_key: int = 256,
) -> DataFrame:
    """Bipartite co-occurrence projection: from distinct (key, item)
    membership pairs (e.g. conv_id -> tool invocations from the
    transcript table), build the weighted item-item graph
    ``(a, b, n_keys)`` with ``a < b`` — two tools are linked by the
    number of conversations that used BOTH. This is the standard
    one-mode projection that turns the transcript corpus into an
    analyzable link graph (tool co-usage, doc-term co-occurrence,
    user-session overlap all share this shape).

    Scale contract: a key with k items emits k*(k-1)/2 pairs, so hub
    keys explode quadratically — a conversation invoking 10^4 tools
    would emit 5*10^7 pairs on its own. Keys above ``max_items_per_key``
    are EXCLUDED (the standard practice: hub keys carry almost no
    co-occurrence signal while dominating the pair volume; Zipf-skewed
    tool usage makes them common at 10^12 turns). The cap bounds the
    self-join fan-out at O(cap * |pairs|) and every stage is a plain
    hash shuffle — no driver-side state. Pass ``max_items_per_key=0``
    to disable the cap (small graphs / tests only).

    Rendered as: distinct -> per-key size -> size-filtered self-join on
    key with a < b -> groupBy pair count. The size table joins back
    broadcastable (one row per key)."""
    p = _capped_membership(pairs, key_col, item_col, max_items_per_key)
    left = p.select("k", F.col("item").alias("a"))
    right = p.select("k", F.col("item").alias("b"))
    return (
        left.join(right, "k")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_keys"))
    )


def _capped_membership(
    pairs: DataFrame, key_col: str, item_col: str, max_items_per_key: int
) -> DataFrame:
    """(k, item) — distinct membership pairs with hub keys above
    ``max_items_per_key`` EXCLUDED (shared by project_bipartite and
    cooccurrence_pmi so joints and marginals come from the SAME filtered
    set). Cap=0 disables."""
    p = pairs.select(
        F.col(key_col).alias("k"), F.col(item_col).alias("item")
    ).distinct()
    if max_items_per_key:
        sizes = p.groupBy("k").agg(F.count(F.lit(1)).alias("sz"))
        p = p.join(
            sizes.where(F.col("sz") <= max_items_per_key).select("k"),
            "k",
            "left_semi",
        )
    return p


def cooccurrence_pmi(
    pairs: DataFrame,
    key_col: str = "key",
    item_col: str = "item",
    max_items_per_key: int = 256,
    min_cooc: int = 2,
) -> DataFrame:
    """(a, b, n_ab, n_a, n_b, pmi, npmi) — (normalized) pointwise mutual
    information of item co-occurrence over key-sets, a < b: the standard
    association score on top of the bipartite projection (collocation
    mining, tool-affinity, doc-term association). With p(x) = n_x /
    n_keys counted over the SAME capped membership as the joint (one
    ``_capped_membership`` rendering feeds marginals, joint, and the key
    total), probabilities are coherent by construction:

        pmi  = ln(p_ab / (p_a * p_b)) = ln(n_ab * n_keys / (n_a * n_b))
        npmi = pmi / -ln(p_ab)  in [-1, 1]   (Bouma 2009); npmi := 1.0
               when p_ab = 1 (the -0/0 perfect-co-occurrence corner).

    Row SELECTION is integer-only (``min_cooc`` on the exact joint
    count), so the output row set is engine-exact; the two log scores
    are the only floats (9 dp absorbs libm ULPs in the oracle). Same
    scale contract as project_bipartite: hub keys excluded, fan-out
    bounded at O(cap x |pairs|), marginals join back broadcastable."""
    p = _capped_membership(pairs, key_col, item_col, max_items_per_key)
    n_keys = p.select("k").distinct().count()
    marg = p.groupBy("item").agg(F.count(F.lit(1)).alias("n"))
    left = p.select("k", F.col("item").alias("a"))
    right = p.select("k", F.col("item").alias("b"))
    co = (
        left.join(right, "k")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_cooc)
    )
    j = (
        co.join(marg.select(F.col("item").alias("a"), F.col("n").alias("n_a")), "a")
        .join(marg.select(F.col("item").alias("b"), F.col("n").alias("n_b")), "b")
    )
    pmi = F.log(
        F.col("n_ab").cast("double")
        * F.lit(float(n_keys))
        / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
    )
    npmi = F.when(F.col("n_ab") == F.lit(n_keys), F.lit(1.0)).otherwise(
        pmi / F.log(F.lit(float(n_keys)) / F.col("n_ab").cast("double"))
    )
    return j.select(
        "a", "b", "n_ab", "n_a", "n_b", pmi.alias("pmi"), npmi.alias("npmi")
    )


def butterfly_counts(
    pairs: DataFrame,
    key_col: str = "key",
    item_col: str = "item",
    max_items_per_key: int = 256,
) -> DataFrame:
    """(item, butterflies) — per-item bipartite 4-cycle (butterfly)
    counts: the bipartite analogue of per-vertex triangle counts
    (Wang et al., "Butterfly Counting in Bipartite Networks", the motif
    underlying bipartite clustering coefficients and spam/collusion
    detection on user-item graphs). A butterfly is two keys sharing two
    items; item i's count is sum over partners j of C(codeg(i,j), 2),
    where codeg is the number of keys containing BOTH — so the whole
    computation rides ``project_bipartite``'s pair-count table and
    inherits its hub cap (keys above ``max_items_per_key`` excluded
    BEFORE wedges are emitted, the same quadratic-fan-out guard).

    100 TB shape: one capped self-join + pair groupBy (the projection),
    then a two-sided explode of the PAIR table (already co-occurrence-
    compressed, far smaller than the wedge stream) into a final
    map-side-combined per-item sum. C(n,2) is exact long arithmetic
    (shiftright, no doubles)."""
    proj = project_bipartite(pairs, key_col, item_col, max_items_per_key)
    n = F.col("n_keys").cast("long")
    bf = proj.select(
        "a", "b", F.shiftright(n * (n - F.lit(1)), 1).alias("bf")
    ).where(F.col("bf") > 0)
    per = bf.select(F.col("a").alias("item"), "bf").unionByName(
        bf.select(F.col("b").alias("item"), "bf")
    )
    return per.groupBy("item").agg(F.sum("bf").alias("butterflies"))


def rich_club(edges: DataFrame) -> DataFrame:
    """(k, n_k, e_k, phi) — the (unnormalized) rich-club coefficient
    staircase: for each threshold k, n_k = vertices with degree > k,
    e_k = undirected edges whose BOTH endpoints have degree > k, and
    phi(k) = 2*e_k / (n_k*(n_k-1)) (Colizza et al. 2006; networkx
    rich_club_coefficient semantics). Rows are emitted at the staircase
    KNOTS — k = 0 plus every distinct observed degree / min-endpoint
    degree — which determine phi at every other k (phi is constant
    between knots); phi is NULL when n_k < 2. Expects the canonical
    symmetric table; self-loops excluded.

    Scale rendering: one degree aggregation (V rows), one min-endpoint-
    degree pass (E rows, two broadcastable degree joins), two tiny
    histograms, then ONE window over the combined DISTINCT-value axis —
    O(distinct degrees) rows (~sqrt-ish of E in heavy-tail graphs),
    never V or E rows, so the single-partition window is a few thousand
    rows even at 10^12 edges. The V-row degree table and both histograms
    are lineage-truncated because the staircase algebra references them
    repeatedly — without the cut the plan re-runs the E-row degree scan
    per reference (measured: 22 HashAggregates, 0 reused exchanges);
    with it the whole operator is exactly TWO E-row passes. All counts
    exact integers; phi is one double division."""
    from pyspark.sql import Window

    from nido_spark.plans import truncate_lineage

    half = edges.where(F.col("src") < F.col("dst")).select("src", "dst")
    deg = truncate_lineage(
        edges.where(F.col("src") != F.col("dst"))
        .groupBy(F.col("src").alias("v"))
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    dh = truncate_lineage(deg.groupBy("deg").agg(F.count(F.lit(1)).alias("nv")))
    md = half.join(
        deg.select(F.col("v").alias("src"), F.col("deg").alias("da")), "src"
    ).join(
        deg.select(F.col("v").alias("dst"), F.col("deg").alias("db")), "dst"
    ).select(F.least("da", "db").alias("md"))
    eh = truncate_lineage(md.groupBy("md").agg(F.count(F.lit(1)).alias("ne")))
    spark = edges.sparkSession
    pts = (
        dh.select(F.col("deg").alias("k"))
        .unionByName(eh.select(F.col("md").alias("k")))
        .unionByName(spark.createDataFrame([(0,)], "k long"))
        .distinct()
    )
    t = (
        pts.join(dh.withColumnRenamed("deg", "k"), "k", "left")
        .join(eh.withColumnRenamed("md", "k"), "k", "left")
        .select(
            "k",
            F.coalesce("nv", F.lit(0)).alias("nv"),
            F.coalesce("ne", F.lit(0)).alias("ne"),
        )
    )
    # strictly-greater suffix sums: rows with larger k under a desc order
    w = (
        Window.orderBy(F.col("k").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = t.select(
        "k",
        F.coalesce(F.sum("nv").over(w), F.lit(0)).alias("n_k"),
        F.coalesce(F.sum("ne").over(w), F.lit(0)).alias("e_k"),
    )
    return t.select(
        "k",
        "n_k",
        "e_k",
        F.when(
            F.col("n_k") >= 2,
            F.lit(2.0)
            * F.col("e_k").cast("double")
            / (F.col("n_k").cast("double") * (F.col("n_k") - F.lit(1)).cast("double")),
        ).alias("phi"),
    )


def node2vec_walks(
    edges: DataFrame,
    starts,
    length: int,
    p: float = 2.0,
    q: float = 0.5,
    seed: int = 42,
    broadcast_threshold: int = 8_000_000,
) -> DataFrame:
    """(start, step, v) — deterministic node2vec walks (Grover & Leskovec
    2016): second-order biased walks where a step from cur (having come
    from prev) weights candidate x by alpha = 1/p if x == prev (return),
    1 if x is adjacent to prev (BFS-ish), else 1/q (DFS-ish); the
    unweighted-graph variant (edge weights ignored). Complements
    ``random_walks`` (first-order) as the embedding-corpus generator
    whose p/q trade local vs global structure.

    Sampling proportional to alpha with NO rand(): the exponential race
    — u_x = (mix+1)/2^31 from the shared seeded affine mix of the
    (start, cur, dst) fold, key_x = -ln(u_x)/alpha_x, pick the minimum —
    draws exactly the alpha-categorical distribution, is reproducible
    across engines/partitionings/retries, and the DuckDB oracle replays
    it term-for-term. Keys are ROUNDED TO 9 DP BEFORE the argmin in both
    engines (the tfidf tie-stability contract: a 1-ulp ln() divergence
    can never flip a winner), ties break on dst asc. The first step has
    no prev, so every alpha falls through to 1/q — a constant positive
    scaling, under which the race is exactly uniform (matching the
    node2vec convention for step 1).

    Scale shape = random_walks plus ONE extra join per step: candidates
    (sum of walker degrees) left-join the edge set on (prev, dst) for
    the adjacency flag — the canonical node2vec cost, rendered as a
    plain composite-key hash join instead of the usual per-vertex
    neighbor-set broadcast (which cannot hold 10^12 edges). Walker state
    stays V-row-bounded and broadcast below the gate; dead-end walkers
    stop early."""
    from nido_spark.pipeline import _SAMPLE_P2, _bucket_col
    from nido_spark.plans import truncate_lineage

    spark = edges.sparkSession
    if isinstance(starts, DataFrame):
        st = starts.select(
            F.col(starts.columns[0]).cast("long").alias("start")
        ).distinct()
    else:
        ids = sorted({int(v) for v in starts})
        if not ids:
            raise ValueError("node2vec_walks needs a non-empty start set")
        st = spark.createDataFrame([(v,) for v in ids], "start long")
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = edges.select("src", "dst").distinct().repartition(nparts, "src").persist()
    e.count()
    st = st.join(e.select(F.col("src").alias("start")).distinct(), "start", "left_semi")
    cur = truncate_lineage(
        st.select(
            "start",
            F.lit(None).cast("long").alias("prev"),
            F.col("start").alias("v"),
        )
    )
    bc = F.broadcast if st.count() <= broadcast_threshold else (lambda df: df)
    adj = e.select(F.col("src").alias("prev"), F.col("dst").alias("dst"), F.lit(1).alias("_adj"))
    out = [cur.select("start", F.lit(0).alias("step"), "v")]
    M20 = 1 << 20
    inv_p, inv_q = 1.0 / p, 1.0 / q
    for step in range(1, length + 1):
        cand = e.join(
            bc(cur.select("start", "prev", F.col("v").alias("src"))), "src"
        ).join(adj, ["prev", "dst"], "left")
        fold = (
            (
                F.pmod(F.col("start"), F.lit(M20)) * M20
                + F.pmod(F.col("src"), F.lit(M20))
            )
            * M20
            + F.pmod(F.col("dst"), F.lit(M20))
        )
        u = (_bucket_col(fold, seed + 1_000_003 * step) + F.lit(1)) / F.lit(
            float(_SAMPLE_P2 + 1)
        )
        alpha = (
            F.when(F.col("dst") == F.col("prev"), F.lit(inv_p))
            .when(F.col("_adj").isNotNull(), F.lit(1.0))
            .otherwise(F.lit(inv_q))
        )
        key = F.round(-F.log(u) / alpha, 9)
        nxt = (
            cand.groupBy("start")
            .agg(F.min(F.struct(key.alias("_k"), F.col("dst"), F.col("src"))).alias("m"))
            .select(
                "start",
                F.col("m.src").alias("prev"),
                F.col("m.dst").alias("v"),
            )
        )
        cur = truncate_lineage(nxt)
        if cur.limit(1).count() == 0:
            break
        out.append(cur.select("start", F.lit(step).alias("step"), "v"))
    e.unpersist()
    from functools import reduce

    return reduce(lambda a, b: a.unionByName(b), out)


def walk_skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """(center, context, cnt) — word2vec skip-gram training pairs from a
    walk corpus (``random_walks``/``node2vec_walks`` output, one row per
    (start, step, v)): every ordered pair of vertices co-visited by the
    same walk at distance 1..``window`` steps, counted corpus-wide.
    Symmetric by construction — each co-visit yields both (a, b) and
    (b, a) — matching word2vec's symmetric context window. This is the
    walks→pairs step of the DeepWalk pipeline (Perozzi '14 §4.2); feed
    the counts to ``cooccurrence_pmi``-style shifted-PMI weighting or an
    external trainer.

    Scale shape: ONE groupBy on the walk id collects each walk into a
    ≤length+1 array (map-side partial collect; walks are generated
    already keyed by start so the exchange moves only walk rows), then
    the pair explosion runs as a higher-order-function expression inside
    whole-stage codegen — no self-join, no second shuffle; ≤ 2·window
    output rows per walk row ahead of the final (center, context) count
    aggregation."""
    if window < 1:
        raise ValueError("window must be >= 1")
    arr = walks.groupBy("start").agg(
        F.sort_array(F.collect_list(F.struct("step", "v"))).alias("a")
    )
    # distinct lambda variable names per nesting level — Spark resolves
    # same-named nested lambda args to the innermost binding (clobbering)
    pair_expr = (
        "flatten(transform(a, ci -> "
        "transform(filter(a, cx -> abs(cx.step - ci.step) BETWEEN 1 AND {w}), "
        "cy -> struct(ci.v AS center, cy.v AS context))))"
    ).format(w=int(window))
    return (
        arr.select(F.explode(F.expr(pair_expr)).alias("p"))
        .groupBy(
            F.col("p.center").alias("center"),
            F.col("p.context").alias("context"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# Weisfeiler-Lehman flow-fingerprint constants: all multipliers < 2^20 and
# state < 2^31, so every expression below stays under 2^62 — ANSI-safe
# (memory: spark-iterative-pitfalls) and bit-identical in any engine.
WL_P = (1 << 31) - 1
WL_A, WL_B = 1_000_003, 8_191
WL_AIN, WL_BIN = 48_271, 11_213
WL_AOUT, WL_BOUT = 69_621, 12_345
WL_AFP, WL_BFP = 16_807, 7


def wl_flow_fingerprint(
    transcripts: DataFrame, iters: int = 3, nparts: int | None = None
) -> DataFrame:
    """(conv_id, wl_fp, n_actors, n_transitions) — a structural fingerprint
    of each conversation's interaction-flow graph via Weisfeiler-Lehman
    label refinement (Weisfeiler-Leman '68; the GIN multiset-sum variant,
    Xu et al. ICLR'19): conversations whose actor-transition multigraphs
    are isomorphic (same roles/tools wired the same way with the same
    transition counts) get the same fingerprint, so `GROUP BY wl_fp` is
    structural dedup of conversation flows — the flow-level counterpart of
    the text-level near-dup family, catching templated agent loops that
    differ only in surface text. 1-WL is a (very strong) isomorphism
    heuristic, not a decision procedure: equal fp does not PROVE
    isomorphism, unequal fp does prove non-isomorphism.

    Per conversation: nodes are actors (role, or 'tool:'+tool), directed
    edges are consecutive-turn transitions weighted by count. Labels start
    as the portable Horner hash of the actor name (dedup's engine-exact
    token hash) and refine for ``iters`` rounds with an order-independent
    multiset-sum update — new = (A*old + S_in + S_out + B) mod P with
    S_dir = sum over neighbors of an affine re-hash of their label scaled
    by the transition count, mod P. Multiset-sum instead of
    sort-and-concatenate is what makes the update a plain join + groupBy
    SUM (no per-row Python, no arrays) AND exactly replayable in SQL —
    the gate oracle unrolls all rounds in DuckDB and matches bit-for-bit.

    Scale: every table is keyed by conv_id — joins co-partition on
    (conv_id, actor), per-conversation graphs are tiny (#distinct actors),
    so there is no skew by construction; the two edge projections are
    pinned once and only the V-row label table moves between rounds.
    Exactness bound: the per-vertex term sum is < distinct-neighbors * 2^31,
    safe for every conversation below 2^32 distinct actors."""
    spark = transcripts.sparkSession
    if nparts is None:
        nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # DELIBERATELY not io.conv_actor_expr(): WL compares structure ACROSS
    # conversations, so roles must be bare ('user', not 'conv_42:user') —
    # conv-scoped names would make every flow graph trivially unique
    actor = (
        F.when(F.col("role") == "tool", F.concat(F.lit("tool:"), F.col("tool")))
        .otherwise(F.col("role"))
        .alias("a")
    )
    t = transcripts.select("conv_id", "turn_idx", actor)
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    adj = t.select(
        "conv_id", "a", F.lead("a").over(w).alias("b")
    ).where(F.col("b").isNotNull())
    edges = adj.groupBy("conv_id", "a", "b").agg(
        F.count("*").cast("long").alias("w")
    )
    e_in = edges.repartition(nparts, "conv_id", "a").persist()
    e_out = edges.repartition(nparts, "conv_id", "b").persist()
    nodes = t.select("conv_id", F.col("a").alias("v")).distinct()

    from nido_spark.dedup import _portable_token_hash
    from nido_spark.plans import truncate_lineage

    lab = truncate_lineage(
        nodes.select(
            "conv_id",
            "v",
            F.pmod(_portable_token_hash(F.col("v")), F.lit(WL_P)).alias("lab"),
        )
    )

    def _side(e: DataFrame, key: str, other: str, a_mul: int, b_add: int) -> DataFrame:
        # per-edge term: rehash(other's label) * w, both < 2^31 -> product
        # < 2^62, mod immediately; the groupBy SUM then stays < d * 2^31
        contrib = F.pmod(
            F.pmod(F.lit(a_mul) * F.col("lab") + F.lit(b_add), F.lit(WL_P))
            * F.col("w"),
            F.lit(WL_P),
        )
        return (
            e.join(
                lab.select(
                    "conv_id", F.col("v").alias(other), F.col("lab")
                ),
                ["conv_id", other],
            )
            .select("conv_id", F.col(key).alias("v"), contrib.alias("c"))
            .groupBy("conv_id", "v")
            .agg(F.pmod(F.sum("c"), F.lit(WL_P)).alias("s"))
        )

    for _ in range(iters):
        s_in = _side(e_in, "b", "a", WL_AIN, WL_BIN)
        s_out = _side(e_out, "a", "b", WL_AOUT, WL_BOUT)
        lab = truncate_lineage(
            lab.join(s_in.withColumnRenamed("s", "sin"), ["conv_id", "v"], "left")
            .join(s_out.withColumnRenamed("s", "sout"), ["conv_id", "v"], "left")
            .select(
                "conv_id",
                "v",
                F.pmod(
                    F.lit(WL_A) * F.col("lab")
                    + F.coalesce("sin", F.lit(0))
                    + F.coalesce("sout", F.lit(0))
                    + F.lit(WL_B),
                    F.lit(WL_P),
                ).alias("lab"),
            )
        )

    fp = lab.groupBy("conv_id").agg(
        F.pmod(
            F.sum(F.pmod(F.lit(WL_AFP) * F.col("lab") + F.lit(WL_BFP), F.lit(WL_P))),
            F.lit(WL_P),
        ).alias("wl_fp"),
        F.count("*").alias("n_actors"),
    )
    trans = edges.groupBy("conv_id").agg(F.sum("w").alias("n_transitions"))
    out = fp.join(trans, "conv_id", "left").select(
        "conv_id",
        "wl_fp",
        "n_actors",
        F.coalesce("n_transitions", F.lit(0)).alias("n_transitions"),
    )
    e_in.unpersist()
    e_out.unpersist()
    return out


def transcripts_to_temporal_edges(transcripts: DataFrame) -> DataFrame:
    """(a, b, t) — directed consecutive-turn actor transitions with firing
    time ``t`` = epoch-seconds of the LATER turn. Actor naming matches
    ``io.transcripts_to_edges``'s dense strategy (conv-scoped roles,
    GLOBAL tool actors), so shared tools bridge conversations in time —
    the substrate for time-respecting reachability over an agent
    ecosystem. Exact duplicate (a, b, t) triples collapse; t stays an
    integer (no float time math anywhere downstream)."""
    from nido_spark.io import conv_actor_expr

    t = transcripts.select(
        "conv_id",
        "turn_idx",
        conv_actor_expr().alias("a"),
        F.col("ts").cast("long").alias("ep"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        t.select(
            "conv_id",
            "a",
            F.lead("a").over(w).alias("b"),
            F.lead("ep").over(w).alias("t"),
        )
        .where(F.col("b").isNotNull())
        .select("a", "b", "t")
        .distinct()
    )


def temporal_reachability(
    tedges: DataFrame,
    seeds: list[str],
    max_iters: int = 64,
    broadcast_threshold: int = 8_000_000,
) -> DataFrame:
    """(v, arr) — earliest time-respecting arrival at every reachable
    actor from the ``seeds`` set (seed arrival = 0): an edge (a, b, t)
    is traversable only if ``t >= arr(a)``, i.e. information can ride a
    transition only after it has reached the source — Kempe/Kleinberg/
    Kumar temporal-path semantics, the causal counterpart of BFS on a
    conversation ecosystem (who could have been influenced by a seed
    tool/actor, and by when). Plain shortest-path reachability
    over-counts here: a conversation that used a tool BEFORE the seed
    touched it is not causally downstream, and only the time gate
    excludes it.

    Iterated min-arrival relaxation to fixpoint: per round ONE E-row
    join+aggregation against the arrival table (gated on ``t >= arr``),
    then a null-aware merge — the ``cc``/``sssp`` plan discipline
    (edges pinned on the gather key once, V-row state broadcast below
    the gate, truncate_lineage per round, loud RuntimeError on
    ``max_iters`` exhaustion). All time math is integer epoch seconds —
    the trajectory is engine-exact, and relaxation is idempotent past
    the fixpoint, so an unrolled SQL replay with >= rounds matches
    bit-for-bit."""
    from nido_spark.plans import truncate_lineage

    spark = tedges.sparkSession
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = tedges.select("a", "b", "t").repartition(nparts, "a").persist()
    e.count()
    verts = truncate_lineage(
        e.select(F.col("a").alias("v"))
        .unionByName(e.select(F.col("b").alias("v")))
        .distinct()
    )
    n = verts.count()
    bc = F.broadcast if n <= broadcast_threshold else (lambda df: df)
    seed_df = spark.createDataFrame([(s,) for s in seeds], "v string")
    n_live = seed_df.join(verts, "v", "left_semi").count()
    if n_live == 0:
        e.unpersist()
        raise ValueError(
            "temporal_reachability: no seed actor exists in the edge table "
            f"(seeds={seeds!r}) — a typo'd seed would otherwise return an "
            "empty result indistinguishable from 'reaches nothing'"
        )
    arr = truncate_lineage(
        verts.join(F.broadcast(seed_df.withColumn("s", F.lit(0).cast("long"))), "v", "left")
        .select("v", F.col("s").alias("arr"))
    )
    for it in range(max_iters):
        cand = (
            e.join(
                bc(
                    arr.where(F.col("arr").isNotNull()).select(
                        F.col("v").alias("a"), "arr"
                    )
                ),
                "a",
            )
            .where(F.col("t") >= F.col("arr"))
            .groupBy(F.col("b").alias("v"))
            .agg(F.min("t").alias("c"))
        )
        new_arr = truncate_lineage(
            arr.join(bc(cand), "v", "left").select(
                "v",
                F.when(F.col("arr").isNull(), F.col("c"))
                .when(F.col("c").isNull(), F.col("arr"))
                .otherwise(F.least("arr", "c"))
                .alias("arr"),
            )
        )
        changed = (
            new_arr.alias("n")
            .join(arr.alias("o"), "v")
            .where(~F.col("n.arr").eqNullSafe(F.col("o.arr")))
            .count()
        )
        arr = new_arr
        if changed == 0:
            e.unpersist()
            return arr.where(F.col("arr").isNotNull())
    e.unpersist()
    raise RuntimeError(
        f"temporal_reachability: no fixpoint after {max_iters} rounds "
        "(raise max_iters)"
    )


def actor_class(col) -> "F.Column":
    """Actor-name -> class: 'tool:*' -> 'tool', 'conv:*' -> 'conv',
    conversation-scoped roles ('<conv_id>:user') -> the role suffix."""
    return (
        F.when(col.startswith("tool:"), F.lit("tool"))
        .when(col.startswith("conv:"), F.lit("conv"))
        .otherwise(F.substring_index(col, ":", -1))
    )


def attribute_mixing(sedges: DataFrame, labels: DataFrame) -> DataFrame:
    """(ca, cb, w, frac) — Newman's attribute mixing matrix over a
    DIRECTED weighted edge table with string endpoints (a, b, w) and a
    (name, cls) label table: w = total edge weight from class ca to
    class cb, frac = w / total. The who-talks-to-whom census of a
    conversation ecosystem (user->assistant vs assistant->tool mass,
    etc.) — the attribute counterpart of degree assortativity
    (graph.assortativity). Two broadcast-joinable label lookups + one
    groupBy over |classes|^2 rows; weights are count-valued so sums are
    exact and frac is one deterministic division (ROUND it for gates)."""
    la = labels.select(F.col("name").alias("a"), F.col("cls").alias("ca"))
    lb = labels.select(F.col("name").alias("b"), F.col("cls").alias("cb"))
    m = (
        sedges.join(F.broadcast(la), "a")
        .join(F.broadcast(lb), "b")
        .groupBy("ca", "cb")
        .agg(F.sum("w").alias("w"))
    )
    tot = m.agg(F.sum("w")).first()[0]
    return m.select("ca", "cb", "w", (F.col("w") / F.lit(float(tot))).alias("frac"))


def attribute_assortativity(sedges: DataFrame, labels: DataFrame) -> float:
    """Newman's directed attribute assortativity coefficient r =
    (sum_i e_ii - sum_i a_i b_i) / (1 - sum_i a_i b_i) over the mixing
    matrix e = attribute_mixing fractions (a_i/b_i = row/column sums) —
    +1 = perfectly assortative (classes only talk to themselves),
    0 = random wiring, negative = disassortative (the usual signature of
    user<->assistant alternation). The matrix is |classes|^2 rows, so
    the reduction is a scalar action over a tiny table."""
    la = labels.select(F.col("name").alias("a"), F.col("cls").alias("ca"))
    lb = labels.select(F.col("name").alias("b"), F.col("cls").alias("cb"))
    # ONE action: collect the tiny |classes|^2 matrix and finish driver-side
    # (the previous rendering re-ran the whole edge aggregation for each of
    # three scalar reductions — review finding r5)
    rows = (
        sedges.join(F.broadcast(la), "a")
        .join(F.broadcast(lb), "b")
        .groupBy("ca", "cb")
        .agg(F.sum("w").alias("w"))
        .collect()
    )
    # weights are count-valued: accumulate as exact integers (collect-order
    # independent), divide once at the end — bit-stable across runs
    wi = {(r["ca"], r["cb"]): int(r["w"]) for r in rows}
    tot = sum(wi.values())
    if tot <= 0:
        return 0.0
    eii_w = sum(w for (ca, cb), w in wi.items() if ca == cb)
    ai_w: dict[str, int] = {}
    bi_w: dict[str, int] = {}
    for (ca, cb), w in wi.items():
        ai_w[ca] = ai_w.get(ca, 0) + w
        bi_w[cb] = bi_w.get(cb, 0) + w
    sum_ab_num = sum(ai_w[c] * bi_w.get(c, 0) for c in sorted(ai_w))
    eii = eii_w / tot
    sum_ab = sum_ab_num / (tot * tot)
    if sum_ab >= 1.0:
        return 0.0  # single class: conventionally undefined; return 0
    return float((eii - sum_ab) / (1.0 - sum_ab))


def disparity_filter(
    edges: DataFrame,
    alpha: float = 0.05,
    keep_all: bool = False,
) -> DataFrame:
    """(a, b, w, alpha) — multiscale backbone extraction (Serrano,
    Boguna & Vespignani 2009, "Extracting the multiscale backbone of
    complex weighted networks"): for each endpoint i of an edge with
    weight w, the null-model p-value alpha_i = (1 - w/s_i)^(k_i - 1)
    (s_i = strength, k_i = degree) measures how UNlikely the edge's
    local weight share is under uniform random splitting; the edge's
    alpha is the min over its two endpoints (significant from either
    side keeps it — the standard OR rule). Rows with alpha < ``alpha``
    survive; ``keep_all=True`` returns every canonical edge with its
    alpha instead (for threshold sweeps). Degree-1 endpoints give
    (1-1)^0 = 1 (never significant on their own side — pow(0,0)=1 on
    both engines). Self-loops excluded; expects the canonical SYMMETRIC
    edge table (both directions present), from which each direction
    contributes its src-side alpha exactly once.

    The pruning primitive that makes 100 TB graph analytics tractable:
    run it FIRST, then the expensive algorithm on the ~1-10% backbone.
    Shape: one V-row degree/strength aggregation, one broadcastable
    join onto E rows (alpha is then a map-side expression), one
    canonical-pair min-aggregation — no pair enumeration, nothing
    quadratic, output bounded by |E|."""
    half = edges.where(F.col("src") != F.col("dst"))
    ds = half.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).alias("k"), F.sum("w").alias("s")
    )
    sided = half.join(ds, half["src"] == ds["v"]).select(
        F.least("src", "dst").alias("a"),
        F.greatest("src", "dst").alias("b"),
        "w",
        F.pow(1.0 - F.col("w") / F.col("s"), F.col("k") - 1).alias("alpha_side"),
    )
    scored = sided.groupBy("a", "b").agg(
        F.max("w").alias("w"), F.min("alpha_side").alias("alpha")
    )
    out = scored.select("a", "b", "w", F.round("alpha", 9).alias("alpha"))
    return out if keep_all else out.where(F.col("alpha") < alpha)


def burt_constraint(
    edges: DataFrame,
    max_wedge_degree: int | None = None,
) -> DataFrame:
    """(v, constraint) — Burt's network constraint (Burt 1992,
    "Structural Holes"): with p_vj = w_vj / sum_k w_vk the normalized
    tie strength, local constraint c_vj = (p_vj + sum_q p_vq * p_qj)^2
    summed over v's neighbors j (q ranges over shared contacts; the
    indirect term is how much of v's energy reaches j through third
    parties). Low constraint = v brokers structural holes; high = v's
    contacts are interlocked. networkx ``constraint`` semantics on the
    weighted graph (isolated vertices excluded — constraint is
    undefined without ties; self-loops dropped).

    Scale shape: normalized fractions are one V-row aggregation + one
    broadcastable join; the indirect term is ONE two-hop self-join of
    the fraction table grouped back to (v, j) — the adamic_adar wedge
    volume, bounded by sum_q deg(q)^2. ``max_wedge_degree`` caps it the
    same way: wedges THROUGH contacts with degree above the cap are
    skipped (a 10^6-degree hub contributes p_vq * p_qj ~ 1/10^12 per
    path — numerically nothing, combinatorially everything), making
    the metric hub-robust at 100 TB. Leave None only when the degree
    distribution is known bounded."""
    half = edges.where(F.col("src") != F.col("dst")).select("src", "dst", "w")
    strength = half.groupBy(F.col("src").alias("v")).agg(
        F.sum("w").alias("s"), F.count(F.lit(1)).alias("deg")
    )
    frac = half.join(strength, half["src"] == strength["v"]).select(
        F.col("src").alias("a"),
        F.col("dst").alias("b"),
        (F.col("w") / F.col("s")).alias("p"),
    )
    mid = frac
    if max_wedge_degree is not None:
        keep = strength.where(F.col("deg") <= max_wedge_degree).select(
            F.col("v").alias("b")
        )
        mid = frac.join(F.broadcast(keep), "b")
    # indirect_vj = sum over q of p_vq * p_qj, q != j (q == v impossible:
    # fractions exclude self-loops, so a path v->q->v has j = v only via
    # a self tie, which was dropped)
    indirect = (
        mid.select(F.col("a").alias("v"), F.col("b").alias("q"), F.col("p").alias("p1"))
        .join(
            frac.select(
                F.col("a").alias("q"), F.col("b").alias("j"), F.col("p").alias("p2")
            ),
            "q",
        )
        .where(F.col("v") != F.col("j"))
        .groupBy("v", "j")
        .agg(F.sum(F.col("p1") * F.col("p2")).alias("ind"))
    )
    local = (
        frac.select(F.col("a").alias("v"), F.col("b").alias("j"), "p")
        .join(indirect, ["v", "j"], "left")
        .select(
            "v",
            ((F.col("p") + F.coalesce("ind", F.lit(0.0))) ** 2).alias("c"),
        )
    )
    return local.groupBy("v").agg(F.round(F.sum("c"), 9).alias("constraint"))

def triad_census(
    directed_edges: DataFrame,
    max_mid_degree: int | None = None,
) -> DataFrame:
    """One-row ``(n_paths, n_cyclic, n_transitive)`` directed-triangle
    motif census over a DIRECTED edge table
    (``io.transcripts_to_directed_edges`` shape): n_paths counts ordered
    2-paths a->b->c (a != c), n_cyclic counts directed 3-cycles
    {a->b, b->c, c->a} (each cycle once — the closed-path count is an
    exact multiple of 3 rotations), n_transitive counts ordered triples
    {a->b, b->c, a->c} (the feed-forward motif, once per shortcut edge).
    The cycle:feed-forward ratio is the classic flow-structure signal —
    conversation graphs with real turn-taking (user<->assistant) carry
    cycles; pipeline-like tool fanout is almost purely transitive.

    Plan: distinct non-self edges, ONE path join (hash on the shared
    middle vertex) and two LEFT joins flagging the closure edge — both
    counts come from ONE final aggregation over the flagged path
    relation; no per-triangle rows survive, no driver loop. The path
    relation is sum_b in(b) x out(b) rows — on hub-heavy graphs pass
    ``max_mid_degree`` to exclude middle vertices whose in x out product
    exceeds it (the adamic_adar hub-cap convention: an explicit,
    documented truncation — counts become a lower bound over the
    non-hub structure — instead of a silent job-killer at 10^10 edges)."""
    e = (
        directed_edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    if max_mid_degree is not None:
        deg = (
            e.groupBy(F.col("dst").alias("v"))
            .agg(F.count(F.lit(1)).alias("_in"))
            .join(
                e.groupBy(F.col("src").alias("v")).agg(
                    F.count(F.lit(1)).alias("_out")
                ),
                "v",
            )
            .where(F.col("_in") * F.col("_out") <= max_mid_degree)
            .select("v")
        )
        mid_ok = deg
        e_in = e.join(mid_ok.withColumnRenamed("v", "dst"), "dst", "left_semi")
    else:
        e_in = e
    p = (
        e_in.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .join(e.select(F.col("src").alias("b"), F.col("dst").alias("c")), "b")
        .where(F.col("a") != F.col("c"))
    )
    cyc = e.select(
        F.col("src").alias("c"), F.col("dst").alias("a"), F.lit(1).alias("_cyc")
    )
    trn = e.select(
        F.col("src").alias("a"), F.col("dst").alias("c"), F.lit(1).alias("_trn")
    )
    flagged = p.join(cyc, ["a", "c"], "left").join(trn, ["a", "c"], "left")
    return flagged.agg(
        F.count(F.lit(1)).alias("n_paths"),
        F.coalesce(F.sum("_cyc"), F.lit(0)).alias("_closed"),
        F.coalesce(F.sum("_trn"), F.lit(0)).cast("long").alias("n_transitive"),
    ).select(
        "n_paths",
        F.expr("_closed div 3").alias("n_cyclic"),
        "n_transitive",
    )


def graph_profile(edges: DataFrame) -> DataFrame:
    """One-row structural profile of the canonical edge table — the
    load-time report a graph user prints before running anything (the
    reference binary prints nv/ne/mass after its CSR load; this is that
    report as a single Spark job):

        (nv, ne_directed, ne_undirected, n_self_loops, n_degree_zero,
         min_deg, max_deg, avg_deg, density)

    Degrees count distinct non-self neighbors (simple-graph view); a
    vertex whose only edges are self-loops has simple degree 0, so it is
    reported in n_degree_zero and forces min_deg to 0 (the degree table
    below can't see it — it filters src != dst — so min_deg is derived
    from nv vs the degree-table row count, not from MIN alone).
    density = ne_undirected / C(nv, 2). All counts exact BIGINTs; the two
    ratios are single divisions of exact integers (engine-bitwise), so
    the whole row value-checks across engines. TWO aggregations total
    (one over E rows, one over the per-vertex degree table) — scan-bound
    at any scale."""
    deg = (
        edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    d = deg.agg(
        F.count(F.lit(1)).alias("nv_proper"),
        F.min("deg").alias("min_deg"),
        F.max("deg").alias("max_deg"),
        F.sum("deg").alias("sum_deg"),
    )
    e = edges.agg(
        F.count(F.lit(1)).cast("long").alias("ne_directed"),
        F.countDistinct("src").cast("long").alias("nv"),
        F.sum((F.col("src") == F.col("dst")).cast("long")).alias("n_self_loops"),
    )
    return e.crossJoin(F.broadcast(d)).select(
        "nv",
        "ne_directed",
        # integer division (DIV), not double-cast: DuckDB's ::BIGINT cast
        # ROUNDS doubles while Spark's cast truncates — the r2 hash-fail
        # class; sum_deg is even on the canonical table either way
        F.expr("sum_deg DIV 2").alias("ne_undirected"),
        F.coalesce("n_self_loops", F.lit(0)).alias("n_self_loops"),
        (F.col("nv") - F.coalesce("nv_proper", F.lit(0)))
        .cast("long")
        .alias("n_degree_zero"),
        F.when(F.coalesce("nv_proper", F.lit(0)) < F.col("nv"), F.lit(0))
        .otherwise(F.coalesce("min_deg", F.lit(0)))
        .cast("long")
        .alias("min_deg"),
        F.coalesce("max_deg", F.lit(0)).cast("long").alias("max_deg"),
        F.round(F.col("sum_deg") / F.col("nv"), 9).alias("avg_deg"),
        F.round(
            (F.col("sum_deg") / F.lit(2))
            / (F.col("nv") * (F.col("nv") - F.lit(1)) / F.lit(2)),
            9,
        ).alias("density"),
    )
