from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from nido_spark import graph as G
from nido_spark import louvain as L
from nido_spark import oracle as O
from tests.conftest import KARATE_EDGES, labels_equivalent, symmetric_arrays


def test_singleton_modularity_karate(karate):
    edges, (src, dst, w) = karate
    labels = L.singleton_labels(edges)
    m = G.mass(edges)
    q = L.modularity(edges, labels, m)
    # singleton partition: no internal pairs (unit weights, no self-loops)
    # Q = -sum(k^2)/(4m^2)
    k = np.bincount(src, weights=w)
    expected = -(k**2).sum() / (4 * m * m)
    assert q == pytest.approx(expected, abs=1e-12)
    assert q == pytest.approx(O.modularity_numpy(src, dst, w), abs=1e-12)


def test_modularity_known_split(karate):
    """Two-community split by the canonical karate factions."""
    edges, (src, dst, w) = karate
    group1 = {0, 1, 2, 3, 4, 5, 6, 7, 10, 11, 12, 13, 16, 17, 19, 21}
    lab = {v: (0 if v in group1 else 33) for v in range(34)}
    spark = edges.sparkSession
    lab_df = spark.createDataFrame(list(lab.items()), "v long, comm long")
    q_spark = L.modularity(edges, lab_df, G.mass(edges))
    q_np = O.modularity_numpy(src, dst, w, lab)
    assert q_spark == pytest.approx(q_np, abs=1e-9)
    assert 0.35 < q_spark < 0.42  # known-good band for the 2-way split


@pytest.mark.parametrize("nbatches", [1, 2, 4])
def test_louvain_sweep_matches_oracle(karate, nbatches):
    """First sweep, label-for-label vs the NumPy oracle (exact arithmetic:
    unit weights -> float sums are exact -> identical trajectories)."""
    edges, (src, dst, w) = karate
    verts = G.vertices(edges)
    m = G.mass(edges)
    labels = L.singleton_labels(edges)
    swept = L.louvain_sweep(edges, labels, verts, m, nbatches)
    got = {r["v"]: r["comm"] for r in swept.collect()}

    uids, s, d = O._vertex_index(src, dst)
    k = np.bincount(s, weights=w)
    comm = O._one_sweep(uids, s, d, w, k, m, np.arange(len(uids)), nbatches)
    want = {int(u): int(uids[c]) for u, c in zip(uids, comm)}
    assert got == want


@pytest.mark.parametrize("nbatches", [1, 2])
def test_louvain_full_matches_oracle_karate(karate, nbatches):
    edges, (src, dst, w) = karate
    res = L.louvain(edges, nbatches=nbatches, local_threshold=0)
    ref = O.louvain_numpy(src, dst, w, nbatches=nbatches)
    assert res.modularity == pytest.approx(ref.modularity, abs=1e-6)
    got = {r["v"]: r["comm"] for r in res.labels.collect()}
    assert labels_equivalent(got, ref.labels)
@pytest.mark.parametrize("nbatches", [2, 4])
def test_louvain_dense_relabel_matches_oracle(karate, nbatches):
    """C1 dense relabel: Spark and NumPy renumber identically (order-
    preserving), so labels match EXACTLY, and after the first coarsening
    the label space is contiguous 0..ncomm-1."""
    edges, (src, dst, w) = karate
    res = L.louvain(edges, nbatches=nbatches, local_threshold=0, dense_relabel=True)
    ref = O.louvain_numpy(src, dst, w, nbatches=nbatches, dense_relabel=True)
    assert res.modularity == pytest.approx(ref.modularity, abs=1e-9)
    got = {r["v"]: r["comm"] for r in res.labels.collect()}
    assert got == ref.labels
    if res.n_phases > 1:  # a coarsening happened -> ids are dense
        assert set(got.values()) == set(range(len(set(got.values()))))


def test_louvain_dense_relabel_same_partition_quality(karate):
    """Dense ids change only batch membership; quality stays in the same
    band and the hybrid local tail honors the flag."""
    edges, (src, dst, w) = karate
    dist = L.louvain(edges, nbatches=4, local_threshold=0, dense_relabel=True)
    hyb = L.louvain(edges, nbatches=4, dense_relabel=True)  # local tail path
    assert dist.modularity == pytest.approx(hyb.modularity, abs=1e-9)
    a = {r["v"]: r["comm"] for r in dist.labels.collect()}
    b = {r["v"]: r["comm"] for r in hyb.labels.collect()}
    assert a == b
    assert 0.3 < dist.modularity < 0.43


def test_louvain_quality_band_karate(karate):
    """Quality scales with nbatches exactly as the reference README says
    (8-32 recommended, README:88-90): nbatches=4 -> Q=0.3869,
    8 -> 0.4188, 16 -> 0.4198 (published optimum ~0.4198). nbatches=1
    (fully synchronous) oscillates from the singleton start and rolls
    straight back — batching is the reference's quality defense."""
    edges, (src, dst, w) = karate
    res = L.louvain(edges, nbatches=4, local_threshold=0)
    ref = O.louvain_numpy(src, dst, w, nbatches=4)
    assert res.modularity == pytest.approx(ref.modularity, abs=1e-6)
    assert 0.35 < res.modularity < 0.43


def test_louvain_two_cliques_bridge(spark):
    """2x K5 + bridge: exact known answer — the two cliques."""
    pairs = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    pairs += [(i, j) for i in range(5, 10) for j in range(i + 1, 10)]
    pairs += [(4, 5)]
    src, dst, w = symmetric_arrays(pairs)
    edges = spark.createDataFrame(
        [(int(a), int(b), float(x)) for a, b, x in zip(src, dst, w)],
        "src long, dst long, w double",
    )
    res = L.louvain(edges, nbatches=1, local_threshold=0)
    got = {r["v"]: r["comm"] for r in res.labels.collect()}
    assert len(set(got.values())) == 2
    assert len({got[v] for v in range(5)}) == 1
    assert len({got[v] for v in range(5, 10)}) == 1
    ref = O.louvain_numpy(src, dst, w, nbatches=1)
    assert res.modularity == pytest.approx(ref.modularity, abs=1e-9)


def test_self_loop_rule(spark):
    """Self-loops: excluded from gain candidates, included in modularity
    (reference graph_cuda.cu:2289-2318 vs :2109-2116)."""
    pairs = [(0, 0), (0, 1), (1, 2)]
    src, dst, w = symmetric_arrays(pairs, [5.0, 1.0, 1.0])
    edges = spark.createDataFrame(
        [(int(a), int(b), float(x)) for a, b, x in zip(src, dst, w)],
        "src long, dst long, w double",
    )
    m = G.mass(edges)
    labels = L.singleton_labels(edges)
    q = L.modularity(edges, labels, m)
    assert q == pytest.approx(O.modularity_numpy(src, dst, w), abs=1e-12)
    # singleton Q here must include the self-loop as internal weight;
    # the self-loop appears once in the symmetric table, so k_0 = 5+1 = 6
    k = {0: 6.0, 1: 2.0, 2: 1.0}
    expected = 5.0 / (2 * m) - sum(x * x for x in k.values()) / (4 * m * m)
    assert q == pytest.approx(expected, abs=1e-12)


def test_mass_invariant_across_coarsening(karate):
    edges, (src, dst, w) = karate
    labels = L.singleton_labels(edges)
    verts = G.vertices(edges)
    m0 = G.mass(edges)
    swept = L.louvain_sweep(edges, labels, verts, m0, 1)
    coarse = L.coarsen(edges, swept)
    assert G.mass(coarse) == pytest.approx(m0, abs=1e-9)


def test_permutation_invariance_of_modularity(spark):
    rng = np.random.default_rng(7)
    pairs = [(int(a), int(b)) for a, b in rng.integers(0, 30, size=(120, 2)) if a != b]
    src, dst, w = symmetric_arrays(pairs)
    perm = rng.permutation(30)
    src_p, dst_p = perm[src], perm[dst]
    q1 = O.modularity_numpy(src, dst, w)
    q2 = O.modularity_numpy(src_p, dst_p, w)
    assert q1 == pytest.approx(q2, abs=1e-12)


@pytest.mark.parametrize("nbatches", [1, 2])
def test_arrow_kernel_matches_sql_kernel(karate, nbatches):
    """The Arrow-block pandas-UDF gain kernel (kernels.py) and the Tungsten
    max_by rendering must produce identical sweeps."""
    edges, (src, dst, w) = karate
    verts = G.vertices(edges)
    m = G.mass(edges)
    labels = L.singleton_labels(edges)
    sql_lab = {r["v"]: r["comm"] for r in
               L.louvain_sweep(edges, labels, verts, m, nbatches, kernel="sql").collect()}
    arr_lab = {r["v"]: r["comm"] for r in
               L.louvain_sweep(edges, labels, verts, m, nbatches, kernel="arrow").collect()}
    assert sql_lab == arr_lab


def test_arrow_kernel_full_louvain(karate):
    edges, (src, dst, w) = karate
    res = L.louvain(edges, nbatches=4, kernel="arrow", local_threshold=0)
    ref = O.louvain_numpy(src, dst, w, nbatches=4)
    assert res.modularity == pytest.approx(ref.modularity, abs=1e-6)
    got = {r["v"]: r["comm"] for r in res.labels.collect()}
    assert labels_equivalent(got, ref.labels)


def test_hybrid_local_tail_matches_distributed(karate):
    """louvain(local_threshold=N) must produce the same labels/Q as the
    fully distributed run — the oracle implements the identical schedule."""
    edges, (src, dst, w) = karate
    dist = L.louvain(edges, nbatches=4, local_threshold=0)
    hyb = L.louvain(edges, nbatches=4)  # karate is below the threshold
    assert hyb.modularity == pytest.approx(dist.modularity, abs=1e-12)
    d = {r["v"]: r["comm"] for r in dist.labels.collect()}
    h = {r["v"]: r["comm"] for r in hyb.labels.collect()}
    assert labels_equivalent(d, h)
    assert hyb.n_phases == dist.n_phases and hyb.total_sweeps == dist.total_sweeps


def test_louvain_random_weight_stress(spark):
    """Mirror of the reference's CHECK-mode stress (graph.hpp:88-100 random
    weights, fixed seed): random weighted graph, full Spark Louvain vs the
    NumPy oracle — modularity 1e-9, labels equivalent."""
    import numpy as np

    rng = np.random.default_rng(1234)
    pairs = list({(int(a), int(b)) for a, b in rng.integers(0, 30, size=(120, 2)) if a != b})
    weights = [float(w) for w in rng.uniform(0.1, 5.0, size=len(pairs))]
    src, dst, w = symmetric_arrays(pairs, weights)
    edges = spark.createDataFrame(
        [(int(a), int(b), float(x)) for a, b, x in zip(src, dst, w)],
        "src long, dst long, w double",
    )
    res = L.louvain(edges, nbatches=2, local_threshold=0)
    ref = O.louvain_numpy(src, dst, w, nbatches=2)
    assert res.modularity == pytest.approx(ref.modularity, abs=1e-9)
    got = {r["v"]: r["comm"] for r in res.labels.collect()}
    assert labels_equivalent(got, ref.labels)


def test_modularity_random_two_community_labels(karate):
    """Mirror of the reference's CHECK-mode random 2-community labels
    (graph_gpu.cpp:421-431): Q of an arbitrary labeling matches the oracle."""
    import numpy as np

    edges, (src, dst, w) = karate
    rng = np.random.default_rng(99)
    verts = sorted(set(src.tolist()) | set(dst.tolist()))
    labels = {int(v): int(rng.integers(0, 2)) for v in verts}
    lab_df = edges.sparkSession.createDataFrame(
        list(labels.items()), "v long, comm long"
    )
    from nido_spark import graph as G

    q_spark = L.modularity(edges, lab_df, G.mass(edges))
    q_ref = O.modularity_numpy(src, dst, w, labels)
    assert q_spark == pytest.approx(q_ref, abs=1e-12)


def test_durable_bucketed_phase_matches_inmemory(spark, karate):
    """durable_edges_prefix: each phase iterates over a src-bucketed
    at-rest table (io.write_bucketed_edges) instead of the in-memory
    repartition pin. The trajectory must be identical and the bucketed
    scan must satisfy src aggregations with NO Exchange — a resumed or
    multi-job deployment re-opens the table and skips the per-phase
    shuffle entirely."""
    from nido_spark.louvain import louvain

    edges, _ = karate
    base = louvain(edges, nbatches=8, local_threshold=0)
    try:
        dur = louvain(
            edges, nbatches=8, local_threshold=0,
            durable_edges_prefix="dur_lv", durable_buckets=8,
        )
        assert dur.modularity == base.modularity
        assert dur.n_phases == base.n_phases
        assert dur.history == base.history
        got = {(r["v"], r["comm"]) for r in dur.labels.collect()}
        want = {(r["v"], r["comm"]) for r in base.labels.collect()}
        assert got == want
        # phase tables are durable and shuffle-free on the iteration key
        t = spark.table("dur_lv_phase0")
        plan = (
            t.groupBy("src").sum("w")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange hashpartitioning" not in plan
    finally:
        for i in range(12):
            spark.sql(f"DROP TABLE IF EXISTS dur_lv_phase{i}")


def test_transcript_louvain_modularity_recomputed_in_sql(spark):
    """Independence strengthening (r3 advice): the transcript_louvain gate
    replays the engine's own NumPy schedule for the local tail, so here
    the FINAL labels' modularity is recomputed from scratch in DuckDB SQL
    (pure relational algebra over the edge table + labels — no shared
    code with the engine or the NumPy oracle) and must agree with the
    engine's reported Q to 1e-9, and clear a partition-quality bar."""
    import duckdb

    from nido_spark.io import synth_transcripts, transcripts_to_edges
    from nido_spark.louvain import louvain

    te = transcripts_to_edges(synth_transcripts(spark, 300, seed=42))
    r = louvain(te, nbatches=8)
    e_pdf = te.toPandas()
    l_pdf = r.labels.toPandas()
    con = duckdb.connect()
    con.register("edges", e_pdf)
    con.register("labels", l_pdf)
    q_sql = con.execute("""
        WITH m AS (SELECT SUM(w) / 2 AS m FROM edges),
        a AS (
          SELECT l.comm, SUM(k) AS a_c
          FROM (SELECT src AS v, SUM(w) AS k FROM edges GROUP BY src) d
          JOIN labels l ON l.v = d.v GROUP BY l.comm
        ),
        internal AS (
          SELECT SUM(e.w) AS iw
          FROM edges e
          JOIN labels ls ON ls.v = e.src
          JOIN labels ld ON ld.v = e.dst
          WHERE ls.comm = ld.comm
        )
        SELECT internal.iw / (2 * m.m)
               - (SELECT SUM(a_c * a_c) FROM a) / (4 * m.m * m.m)
        FROM internal, m
    """).fetchone()[0]
    assert abs(q_sql - r.modularity) < 1e-9
    assert q_sql > 0.6  # strong community structure on the fixture


def test_community_stats_matches_pure_python(spark, karate):
    """community_stats vs a direct edge-walk recomputation on karate with
    pmod-4 labels, plus the volume/cut/internal identities and the
    conductance range."""
    edges, (src, dst, w) = karate
    labels = L.singleton_labels(edges).select(
        "v", F.pmod("v", F.lit(4)).alias("comm")
    )
    m = G.mass(edges)
    got = {r["comm"]: r for r in L.community_stats(edges, labels, m).collect()}

    # pure-Python recomputation over the undirected edge list (each pair once)
    import collections

    und = set()
    for s, d, ww in zip(src.tolist(), dst.tolist(), w.tolist()):
        und.add((min(s, d), max(s, d), ww))
    comm = lambda v: v % 4
    vol = collections.defaultdict(float)
    internal = collections.defaultdict(float)
    cut = collections.defaultdict(float)
    nvert = collections.Counter(comm(v) for v in {x for s, d, _ in und for x in (s, d)})
    for s, d, ww in und:
        if s == d:
            vol[comm(s)] += ww
            internal[comm(s)] += ww
            continue
        vol[comm(s)] += ww
        vol[comm(d)] += ww
        if comm(s) == comm(d):
            internal[comm(s)] += ww
        else:
            cut[comm(s)] += ww
            cut[comm(d)] += ww
    assert set(got) == set(nvert)
    for c, r in got.items():
        assert r["n_vertices"] == nvert[c]
        assert abs(r["volume"] - vol[c]) < 1e-9
        assert abs(r["internal_w"] - internal[c]) < 1e-9
        assert abs(r["cut_w"] - cut[c]) < 1e-9
        want_den = min(vol[c], 2 * m - vol[c])
        if want_den > 0:
            assert abs(r["conductance"] - cut[c] / want_den) < 1e-9
            assert 0.0 <= r["conductance"] <= 1.0
        else:
            assert r["conductance"] is None
    # global identity: volumes sum to 2m; per-community identity below
    assert abs(sum(r["volume"] for r in got.values()) - 2 * m) < 1e-9
    for c, r in got.items():
        self_w = sum(ww for s, d, ww in und if s == d and comm(s) == c)
        assert abs(r["volume"] - (2 * r["internal_w"] - self_w + r["cut_w"])) < 1e-9


@pytest.mark.parametrize("gamma", [0.5, 2.5])
def test_louvain_resolution_matches_oracle(karate, gamma):
    """Reichardt-Bornholdt resolution: Spark trajectory (distributed path,
    local tail disabled) matches the NumPy oracle at gamma != 1 exactly —
    partition up to relabeling, Q to 1e-9 — and the community count moves
    the documented direction (gamma<1 coarser, gamma>1 finer than the 6
    classic-karate communities at nbatches=4)."""
    edges, (src, dst, w) = karate
    got = L.louvain(edges, nbatches=4, local_threshold=0, gamma=gamma)
    ref = O.louvain_numpy(src, dst, w, nbatches=4, gamma=gamma)
    glab = {r["v"]: r["comm"] for r in got.labels.collect()}
    assert labels_equivalent(glab, ref.labels)
    assert got.modularity == pytest.approx(ref.modularity, abs=1e-9)
    n_comms = len(set(glab.values()))
    assert (n_comms < 6) if gamma < 1 else (n_comms > 6)


def test_louvain_resolution_kernel_parity_and_tail(karate):
    """At gamma != 1 the Arrow and SQL sweep renderings still agree
    move-for-move, and the hybrid local tail (NumPy finish) carries gamma
    instead of silently reverting to classic modularity."""
    edges, (src, dst, w) = karate
    labels = L.singleton_labels(edges)
    verts = G.vertices(edges)
    m = G.mass(edges)
    s_sql = {
        (r["v"], r["comm"])
        for r in L.louvain_sweep(
            edges, labels, verts, m, 2, kernel="sql", gamma=2.5
        ).collect()
    }
    s_arr = {
        (r["v"], r["comm"])
        for r in L.louvain_sweep(
            edges, labels, verts, m, 2, kernel="arrow", gamma=2.5
        ).collect()
    }
    assert s_sql == s_arr
    got = L.louvain(edges, nbatches=4, local_threshold=100_000, gamma=2.5)
    ref = O.louvain_numpy(src, dst, w, nbatches=4, gamma=2.5)
    assert got.modularity == pytest.approx(ref.modularity, abs=1e-9)


def test_partition_agreement_reference_and_edge_cases(spark):
    """ARI/NMI match an independent driver-side implementation on a seeded
    correlated pair of labelings; identical-up-to-relabeling scores 1.0/1.0
    (the north rule's acceptance criterion, quantified); the degenerate
    constant-labeling conventions hold (const==const -> 1.0, const vs
    varied -> 0.0)."""
    import math
    from collections import Counter

    rng = np.random.default_rng(11)
    n = 500
    la = rng.integers(0, 7, n)
    lb = np.where(rng.random(n) < 0.7, la, rng.integers(0, 9, n))

    def ref(a, b):
        cont = Counter(zip(a.tolist(), b.tolist()))
        ai, bj = Counter(a.tolist()), Counter(b.tolist())
        comb2 = lambda x: x * (x - 1) / 2  # noqa: E731
        s_ij = sum(comb2(v) for v in cont.values())
        s_a = sum(comb2(v) for v in ai.values())
        s_b = sum(comb2(v) for v in bj.values())
        exp = s_a * s_b / comb2(n)
        ari = (s_ij - exp) / ((s_a + s_b) / 2 - exp)
        mi = sum(
            (v / n) * math.log(n * v / (ai[x] * bj[y]))
            for (x, y), v in cont.items()
        )
        ha = -sum((v / n) * math.log(v / n) for v in ai.values())
        hb = -sum((v / n) * math.log(v / n) for v in bj.values())
        return ari, mi / math.sqrt(ha * hb)

    A = spark.createDataFrame(
        [(int(i), int(c)) for i, c in enumerate(la)], "v long, comm long"
    )
    B = spark.createDataFrame(
        [(int(i), int(c)) for i, c in enumerate(lb)], "v long, comm long"
    )
    got = L.partition_agreement(A, B).first()
    exp_ari, exp_nmi = ref(la, lb)
    assert got["n"] == n
    assert got["ari"] == pytest.approx(exp_ari, abs=1e-8)
    assert got["nmi"] == pytest.approx(exp_nmi, abs=1e-8)

    r2 = L.partition_agreement(A, A.selectExpr("v", "comm + 100 AS comm")).first()
    assert (r2["ari"], r2["nmi"]) == (1.0, 1.0)
    c1 = A.selectExpr("v", "0 AS comm")
    r3 = L.partition_agreement(c1, A.selectExpr("v", "5 AS comm")).first()
    assert (r3["ari"], r3["nmi"]) == (1.0, 1.0)
    r4 = L.partition_agreement(c1, A).first()
    assert r4["nmi"] == 0.0


def test_resolution_profile_karate(karate):
    """The gamma sweep reports monotone-nondecreasing community counts on
    karate (coarse -> fine), agreement scores against the previous gamma,
    and each row's Q matching a direct louvain run at that gamma."""
    edges, (src, dst, w) = karate
    prof = L.resolution_profile(edges, [2.5, 0.5, 1.0], nbatches=4)
    assert [r["gamma"] for r in prof] == [0.5, 1.0, 2.5]  # sorted ascending
    ncs = [r["n_comms"] for r in prof]
    assert ncs == sorted(ncs) and ncs[0] < ncs[-1]
    assert prof[0]["ari_vs_prev"] is None
    for r in prof[1:]:
        assert 0.0 <= r["ari_vs_prev"] <= 1.0 and 0.0 <= r["nmi_vs_prev"] <= 1.0
    for r in prof:
        ref = O.louvain_numpy(src, dst, w, nbatches=4, gamma=r["gamma"])
        assert r["modularity"] == pytest.approx(ref.modularity, abs=1e-9)


def test_ecg_weights_and_final_match_numpy_replay(karate):
    """ECG end to end against driver-side replays: every ensemble member is
    a deterministic level-1 Louvain (exactly reproduced by the NumPy oracle
    at the same nbatches), co-association weights match the replayed votes
    with the 2-core floor to 1e-12, and the final clustering over the
    reweighted table matches the oracle run on the same reweighted arrays
    (partition up to relabeling, Q to 1e-9)."""
    edges, (src, dst, w) = karate
    ens = (1, 2, 4)
    min_w = 0.05
    members = [
        O.louvain_numpy(src, dst, w, nbatches=nb, max_phases=1) for nb in ens
    ]
    core = O.k_core_numpy(src, dst)
    exp = {}
    for a, b, x in zip(src.tolist(), dst.tolist(), w.tolist()):
        votes = sum(1 for m in members if m.labels[a] == m.labels[b])
        if core[a] >= 2 and core[b] >= 2:
            exp[(a, b)] = x * (min_w + (1 - min_w) * votes / len(ens))
        else:
            exp[(a, b)] = x * min_w
    rows = L.ecg_weights(
        edges, ensemble_nbatches=ens, min_weight=min_w, with_votes=True
    ).collect()
    got = {(r["src"], r["dst"]): r["w"] for r in rows}
    assert set(got) == set(exp)
    assert all(abs(got[e] - exp[e]) < 1e-12 for e in exp)
    # with_votes surface: exact integer ensemble trajectory + 2-core mask
    for r in rows:
        a, b = r["src"], r["dst"]
        assert r["votes"] == sum(
            1 for m in members if m.labels[a] == m.labels[b]
        )
        assert r["in_2core"] == int(core[a] >= 2 and core[b] >= 2)

    res = L.ecg(
        edges, ensemble_nbatches=ens, min_weight=min_w,
        nbatches=4, local_threshold=0,
    )
    rw = sorted(got.items())
    rs = np.array([a for (a, _b), _ in rw])
    rd = np.array([b for (_a, b), _ in rw])
    rwt = np.array([x for _, x in rw])
    ref = O.louvain_numpy(rs, rd, rwt, nbatches=4)
    glab = {r["v"]: r["comm"] for r in res.labels.collect()}
    assert labels_equivalent(glab, ref.labels)
    assert res.modularity == pytest.approx(ref.modularity, abs=1e-9)


def test_leiden_numpy_parity_and_guarantee(karate):
    """Deterministic Leiden: exact label + Q parity with oracle.leiden_numpy
    at two batch schedules; every returned community is CONNECTED (the
    Leiden guarantee — refine_connected is a fixpoint of the output); and
    on the nb=4 schedule the warm-started multi-level run strictly beats
    plain Louvain's modularity on the same schedule (the published
    motivation, deterministic on this fixture)."""
    from conftest import labels_equivalent

    from nido_spark.algos import refine_connected
    from nido_spark.oracle import leiden_numpy, louvain_numpy

    edges, (src, dst, w) = karate
    for nb in (4, 8):
        ref = leiden_numpy(src, dst, w, nbatches=nb)
        got = L.leiden(edges, nbatches=nb)
        glab = {r["v"]: r["comm"] for r in got.labels.collect()}
        assert glab == ref.labels
        assert got.modularity == pytest.approx(ref.modularity, abs=1e-9)
        assert (got.n_phases, got.total_sweeps) == (ref.n_phases, ref.total_sweeps)
        # Leiden guarantee: splitting by connectivity changes nothing
        fixed = {
            r["v"]: r["comm"]
            for r in refine_connected(got.labels, edges).collect()
        }
        assert labels_equivalent(glab, fixed)
    lv = louvain_numpy(src, dst, w, nbatches=4)
    ld = leiden_numpy(src, dst, w, nbatches=4)
    assert ld.modularity > lv.modularity + 1e-6


def test_louvain_warm_start_parity_and_convergence(karate):
    """init_labels warm start: exact NumPy parity on BOTH the distributed
    and local-tail paths, canonicalization makes a singleton init a no-op,
    and a seeded start converges in fewer sweeps than cold (the
    incremental re-clustering contract)."""
    edges, (src, dst, w) = karate
    spark = edges.sparkSession
    g1 = {0, 1, 2, 3, 4, 5, 6, 7, 10, 11, 12, 13, 16, 17, 19, 21}
    init = {v: (0 if v in g1 else 33) for v in range(34)}
    init_df = spark.createDataFrame(list(init.items()), "v long, comm long")
    ref = O.louvain_numpy(src, dst, w, nbatches=4, init_ids=init)
    for lt in (0, 100_000):
        got = L.louvain(edges, nbatches=4, local_threshold=lt,
                        init_labels=init_df)
        glab = {r["v"]: r["comm"] for r in got.labels.collect()}
        assert glab == ref.labels, f"local_threshold={lt}"
        assert got.modularity == pytest.approx(ref.modularity, abs=1e-9)
        assert got.total_sweeps == ref.total_sweeps
    cold = O.louvain_numpy(src, dst, w, nbatches=4)
    assert ref.total_sweeps < cold.total_sweeps  # 3 vs 7 on this fixture
    # singleton init is canonicalization-invariant: identical to no init
    sing = spark.createDataFrame([(v, v) for v in range(34)], "v long, comm long")
    a = L.louvain(edges, nbatches=4, local_threshold=0, init_labels=sing)
    b = L.louvain(edges, nbatches=4, local_threshold=0)
    assert ({r["v"]: r["comm"] for r in a.labels.collect()}
            == {r["v"]: r["comm"] for r in b.labels.collect()})


def test_warm_start_incremental_edge_batch(spark):
    """The incremental deployment loop: cluster a graph, grow it with an
    edge batch (new clique + bridge), re-cluster WARM from the old
    labels. New vertices (absent from the seed) enter as singletons and
    end up co-clustered with their clique; old structure keeps labels;
    the warm trajectory is exactly the NumPy replay seeded the same way."""
    import numpy as np

    from tests.conftest import symmetric_arrays

    pairs0 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    pairs0 += [(i, j) for i in range(5, 10) for j in range(i + 1, 10)]
    pairs0 += [(4, 5)]
    s0, d0, w0 = symmetric_arrays(pairs0)
    e0 = spark.createDataFrame(
        [(int(a), int(b), float(x)) for a, b, x in zip(s0, d0, w0)],
        "src long, dst long, w double",
    )
    base = L.louvain(e0, nbatches=1, local_threshold=0)
    old_labels = base.labels

    # edge batch: a third clique 10..14 bridged to vertex 9
    pairs1 = pairs0 + [(i, j) for i in range(10, 15) for j in range(i + 1, 15)]
    pairs1 += [(9, 10)]
    s1, d1, w1 = symmetric_arrays(pairs1)
    e1 = spark.createDataFrame(
        [(int(a), int(b), float(x)) for a, b, x in zip(s1, d1, w1)],
        "src long, dst long, w double",
    )
    init = {r["v"]: r["comm"] for r in old_labels.collect()}
    warm = L.louvain(e1, nbatches=1, local_threshold=0, init_labels=old_labels)
    ref = O.louvain_numpy(s1, d1, w1, nbatches=1, init_ids=init)
    glab = {r["v"]: r["comm"] for r in warm.labels.collect()}
    assert glab == ref.labels
    assert warm.modularity == pytest.approx(ref.modularity, abs=1e-9)
    # all 15 vertices labeled; the new clique is one community
    assert set(glab) == set(range(15))
    assert len({glab[v] for v in range(10, 15)}) == 1
    assert len(set(glab.values())) == 3


def test_resolution_profile_leiden(karate):
    """algorithm='leiden' profiles the leiden sweep: per-gamma Q matches a
    direct leiden_numpy run; unknown algorithms raise loudly."""
    edges, (src, dst, w) = karate
    prof = L.resolution_profile(edges, [0.5, 1.0], algorithm="leiden",
                                nbatches=4)
    for r in prof:
        ref = O.leiden_numpy(src, dst, w, nbatches=4, gamma=r["gamma"])
        assert r["modularity"] == pytest.approx(ref.modularity, abs=1e-9)
        assert r["n_comms"] == len(set(ref.labels.values()))
    with pytest.raises(ValueError, match="algorithm"):
        L.resolution_profile(edges, [1.0], algorithm="cpm")
