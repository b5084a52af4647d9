from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from nido_spark import graph as G


def test_vertices_and_mass_karate(karate):
    edges, (src, dst, w) = karate
    verts = {r["v"]: (r["k"], r["deg"], r["max_w"]) for r in G.vertices(edges).collect()}
    nv = 34
    assert len(verts) == nv
    deg_np = np.bincount(src, minlength=nv)
    for v in range(nv):
        k, deg, mw = verts[v]
        assert deg == deg_np[v]
        assert abs(k - deg_np[v]) < 1e-12  # unit weights
        assert mw == 1.0
    assert abs(G.mass(edges) - 78.0) < 1e-12
    assert G.max_order(edges) == 17  # vertex 33


def test_normalize_edges_symmetrizes_and_sums(spark):
    one_dir = spark.createDataFrame(
        [(0, 1, 2.0), (0, 1, 3.0), (1, 2, 1.0), (3, 3, 4.0)],
        "src long, dst long, w double",
    )
    e = G.normalize_edges(one_dir)
    rows = {(r["src"], r["dst"]): r["w"] for r in e.collect()}
    assert rows[(0, 1)] == 5.0 and rows[(1, 0)] == 5.0
    assert rows[(1, 2)] == 1.0 and rows[(2, 1)] == 1.0
    assert rows[(3, 3)] == 4.0  # self-loop kept, not mirrored/doubled
    assert len(rows) == 5
    v = G.validate_edges(e)
    assert v["asym"] == 0


def test_salted_weighted_degree_matches_plain(karate):
    edges, _ = karate
    plain = {r["v"]: r["k"] for r in G.vertices(edges).collect()}
    salted = {r["v"]: r["k"] for r in G.salted_weighted_degree(edges, 4).collect()}
    assert plain == salted


def test_degree_histogram(karate):
    edges, (src, _, _) = karate
    hist = G.degree_histogram(edges).collect()
    assert sum(r["n_vertices"] for r in hist) == 34
    assert max(r["max_deg"] for r in hist) == 17


def test_ba_random_edges_properties(spark):
    from nido_spark.io import ba_random_edges

    e = ba_random_edges(spark, 200, m0=4, seed=7)
    v = G.validate_edges(e)
    assert v["asym"] == 0 and v["min_w"] > 0
    # heavy tail: early vertices accumulate degree
    deg = {r["v"]: r["deg"] for r in G.vertices(e).collect()}
    early = sum(deg.get(i, 0) for i in range(10))
    late = sum(deg.get(i, 0) for i in range(190, 200))
    assert early > late
    # determinism across partitionings
    e2 = ba_random_edges(spark, 200, m0=4, seed=7, partitions=5)
    assert sorted(map(tuple, e.collect())) == sorted(map(tuple, e2.collect()))


def test_label_sink_roundtrip(karate, tmp_path):
    from nido_spark.io import read_labels, write_labels
    from nido_spark.louvain import singleton_labels

    edges, _ = karate
    lab = singleton_labels(edges)
    write_labels(lab, str(tmp_path / "labels"), order_by_vertex=True)
    back = read_labels(edges.sparkSession, str(tmp_path / "labels"))
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, lab.collect()))


def test_bucketed_edge_tables_join_without_shuffle(spark, karate, tmp_path):
    """write_bucketed_edges: two tables bucketed on src with equal bucket
    counts must join with NO Exchange on either side (bucket alignment),
    and produce the same rows as the plain join."""
    from nido_spark.io import write_bucketed_edges

    edges, _ = karate
    write_bucketed_edges(edges, "bk_a", buckets=4, path=str(tmp_path / "a"))
    write_bucketed_edges(
        edges.withColumnRenamed("w", "w2").select("src", "dst", "w2"),
        "bk_b", buckets=4, path=str(tmp_path / "b"),
    )
    try:
        a = spark.table("bk_a")
        b = spark.table("bk_b").groupBy("src").count()
        joined = a.join(b, "src")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan
        got = joined.groupBy().sum("count").first()[0]
        want = (
            edges.join(edges.groupBy("src").count(), "src")
            .groupBy().sum("count").first()[0]
        )
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")


def test_read_transcripts_format_honored(spark, tmp_path):
    """source_format is passed straight through — parquet by default,
    named formats verbatim, and NO silent parquet fallback when the
    requested source (e.g. an Iceberg catalog) is unavailable."""
    import pytest
    from nido_spark.io import read_transcripts, synth_transcripts

    t = synth_transcripts(spark, 5, seed=1)
    p = str(tmp_path / "tx")
    t.write.parquet(p)
    assert read_transcripts(spark, p).count() == t.count()

    j = str(tmp_path / "tx_json")
    t.write.json(j)
    assert read_transcripts(spark, j, source_format="json").count() == t.count()

    with pytest.raises(Exception):
        # no iceberg runtime in this image: must raise, not fall back
        read_transcripts(spark, p, source_format="iceberg").count()


def test_sample_stratified_many_strata_stays_broadcast(spark):
    """10^4-strata mixes must not become 10^4-clause predicates (r3 review
    finding): the literal-table join form keeps expression size O(1) and
    matches the per-stratum uniform sampler exactly."""
    from pyspark.sql import functions as F

    from nido_spark.pipeline import sample_corpus, sample_stratified

    n_strata = 5000
    docs = spark.range(20000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % n_strata).cast("string")).alias("lang"),
    )
    rates = {f"s{i}": (0.9 if i % 3 == 0 else 0.2) for i in range(n_strata)}
    out = sample_stratified(docs, rates, seed=11)
    assert out.columns == docs.columns
    # equality vs composing the uniform sampler per stratum on a spot-check
    for s in ("s0", "s1", "s4999"):
        strat = {r["doc_id"] for r in out.where(F.col("lang") == s).collect()}
        uni = {
            r["doc_id"]
            for r in sample_corpus(
                docs.where(F.col("lang") == s), rates[s], seed=11
            ).collect()
        }
        assert strat == uni
    # the broadcast-join plan, not a mega-predicate
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_neighbor_sample_deterministic_and_bounded(spark, karate):
    """GraphSAGE-style fanout: at most `fanout` neighbors per src, a true
    subset of the edge set, identical across partition layouts and runs,
    different under a different seed (on a graph with degree > fanout)."""
    from nido_spark.graph import neighbor_sample

    edges, _ = karate
    got = {(r["src"], r["dst"]) for r in neighbor_sample(edges, 3, seed=7).collect()}
    again = {
        (r["src"], r["dst"])
        for r in neighbor_sample(edges.repartition(9), 3, seed=7).collect()
    }
    assert got == again  # partition-layout independent
    all_edges = {(r["src"], r["dst"]) for r in edges.collect()}
    assert got <= all_edges
    from collections import Counter

    per_src = Counter(s for s, _ in got)
    assert max(per_src.values()) <= 3
    deg = Counter(s for s, _ in all_edges)
    for v, d in deg.items():
        assert per_src[v] == min(d, 3)  # full fanout where degree allows
    other = {(r["src"], r["dst"]) for r in neighbor_sample(edges, 3, seed=8).collect()}
    assert other != got


def test_sink_format_honored(spark, tmp_path):
    """Write-side mirror of the read hook (VERDICT r4 task 5): sink_format
    + options reach the writer verbatim for both the path sink
    (write_labels -> json readable back as json) and the catalog sink
    (write_labels_table / write_bucketed_edges as ORC tables); an
    unavailable lake format raises instead of silently writing parquet."""
    import pytest

    from nido_spark.io import write_bucketed_edges, write_labels, write_labels_table

    lab = spark.createDataFrame([(1, 10), (2, 10), (3, 20)], "v long, comm long")
    jp = str(tmp_path / "labels_json")
    write_labels(lab, jp, sink_format="json")
    back = spark.read.json(jp)
    assert back.count() == 3 and {r["comm"] for r in back.collect()} == {10, 20}

    try:
        write_labels_table(lab, "lbl_orc", sink_format="orc",
                           options={"path": str(tmp_path / "lbl_orc")})
        prov = spark.sql("DESCRIBE TABLE EXTENDED lbl_orc").collect()
        assert any("orc" in str(r).lower() for r in prov)

        edges = spark.createDataFrame(
            [(1, 2, 1.0), (2, 1, 1.0)], "src long, dst long, w double"
        )
        write_bucketed_edges(edges, "bk_orc", buckets=2,
                             path=str(tmp_path / "bk_orc"), sink_format="orc")
        prov2 = spark.sql("DESCRIBE TABLE EXTENDED bk_orc").collect()
        assert any("orc" in str(r).lower() for r in prov2)
        assert spark.table("bk_orc").count() == 2
    finally:
        spark.sql("DROP TABLE IF EXISTS lbl_orc")
        spark.sql("DROP TABLE IF EXISTS bk_orc")

    with pytest.raises(Exception):
        # no iceberg runtime in this image: must raise, not fall back
        write_labels(lab, str(tmp_path / "lbl_ice"), sink_format="iceberg")


def test_degree_assortativity_matches_networkx(spark, karate):
    """Exact-integer-sum Pearson over (deg_src, deg_dst) pairs ==
    networkx degree_assortativity_coefficient on karate and a random
    graph (karate is famously disassortative, ~-0.4756)."""
    import networkx as nx

    from nido_spark.graph import degree_assortativity
    from nido_spark.io import ba_random_edges

    for edges in (karate[0], ba_random_edges(spark, 200, m0=3, seed=5)):
        row = degree_assortativity(edges).first()
        g = nx.Graph()
        rows = edges.select("src", "dst").collect()
        g.add_edges_from((r["src"], r["dst"]) for r in rows if r["src"] != r["dst"])
        want = nx.degree_assortativity_coefficient(g)
        assert abs(row["assortativity"] - want) < 1e-9, (row, want)
        assert row["n_edges"] == 2 * g.number_of_edges()


def _bucket_py(x: int, seed: int) -> int:
    """Python-integer replay of pipeline._bucket_col (exact arithmetic)."""
    from nido_spark.pipeline import (
        _SAMPLE_A1, _SAMPLE_A2, _SAMPLE_B1, _SAMPLE_B2, _SAMPLE_P, _SAMPLE_P2,
    )

    xx = (x % _SAMPLE_P) + seed
    r1 = (_SAMPLE_A1 * xx + _SAMPLE_B1) % _SAMPLE_P
    return (_SAMPLE_A2 * (r1 % (1 << 30)) + _SAMPLE_B2) % _SAMPLE_P2


def test_random_walks_deterministic_and_replayable(spark, karate):
    """Walks are (1) valid paths over the edge set, (2) bit-identical
    across repartitionings, (3) seed-sensitive, and (4) EXACTLY replayed
    by a pure-Python argmin over the same affine mix — the engine-
    portability contract shared with neighbor_sample."""
    from nido_spark.graph import random_walks

    edges = karate[0]
    starts = [0, 5, 11, 33]
    walks = random_walks(edges, starts, length=6, seed=9).collect()
    got = {}
    for r in walks:
        got.setdefault(r["start"], {})[r["step"]] = r["v"]
    assert set(got) == set(starts)
    adj = {}
    for r in edges.select("src", "dst").collect():
        adj.setdefault(r["src"], set()).add(r["dst"])
    M20 = 1 << 20
    for s in starts:
        path = [got[s][i] for i in range(7)]
        assert path[0] == s
        cur = s
        for step in range(1, 7):
            # python replay of the per-step argmin
            key = lambda d: ((s % M20) * M20 + (cur % M20)) * M20 + (d % M20)
            want = min(adj[cur], key=lambda d: (_bucket_py(key(d), 9 + 1_000_003 * step), d))
            assert path[step] == want, (s, step)
            assert path[step] in adj[cur]
            cur = path[step]

    reparted = random_walks(edges.repartition(13), starts, length=6, seed=9).collect()
    assert sorted(map(tuple, reparted)) == sorted(map(tuple, walks))
    other = random_walks(edges, starts, length=6, seed=10).collect()
    assert sorted(map(tuple, other)) != sorted(map(tuple, walks))


def test_random_walks_dead_end_stops(spark):
    """A walker with no out-neighbor stops early: directed chain 0->1->2
    gives start 0 steps 0,1,2 then nothing."""
    from nido_spark.graph import random_walks

    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0)], "src long, dst long, w double"
    )
    rows = random_walks(edges, [0], length=5, seed=1).collect()
    assert {(r["step"], r["v"]) for r in rows} == {(0, 0), (1, 1), (2, 2)}


def test_walk_skipgram_pairs_brute_force(spark):
    """Skip-gram pairs from a hand-built walk corpus match a brute-force
    Python count over every |i-j| in [1, window] permutation, including
    a length-1 walk (no pairs) and repeated vertices across walks
    (corpus-level aggregation)."""
    import collections
    import itertools

    from nido_spark.graph import walk_skipgram_pairs

    walks = {10: [5, 6, 7, 8, 6], 11: [6, 5], 12: [7], 13: [5, 6]}
    rows = [
        (wid, i, v) for wid, vs in walks.items() for i, v in enumerate(vs)
    ]
    df = spark.createDataFrame(rows, "start long, step int, v long")
    for window in (1, 2, 3):
        got = {
            (r["center"], r["context"]): r["cnt"]
            for r in walk_skipgram_pairs(df, window=window).collect()
        }
        exp = collections.Counter()
        for vs in walks.values():
            for i, j in itertools.permutations(range(len(vs)), 2):
                if 1 <= abs(i - j) <= window:
                    exp[(vs[i], vs[j])] += 1
        assert got == dict(exp), window
    # symmetric window => symmetric counts
    pairs = {
        (r["center"], r["context"]): r["cnt"]
        for r in walk_skipgram_pairs(df, window=2).collect()
    }
    assert all(pairs[(b, a)] == c for (a, b), c in pairs.items())


def test_walk_skipgram_pairs_on_real_walks(spark, karate):
    """End-to-end walks -> pairs on karate: row count bound (<= 2*window
    per walk row) and every pair's vertices co-occur within the window in
    the generating walk."""
    from nido_spark.graph import random_walks, walk_skipgram_pairs

    edges, _ = karate
    wk = random_walks(edges, list(range(8)), length=6, seed=9)
    wrows = wk.collect()
    out = walk_skipgram_pairs(wk, window=2)
    total = out.agg({"cnt": "sum"}).first()[0]
    assert 0 < total <= 2 * 2 * len(wrows)
    byw = {}
    for r in wrows:
        byw.setdefault(r["start"], {})[r["step"]] = r["v"]
    valid = set()
    for steps in byw.values():
        for i, a in steps.items():
            for j, b in steps.items():
                if 1 <= abs(i - j) <= 2:
                    valid.add((a, b))
    got = {(r["center"], r["context"]) for r in out.collect()}
    assert got <= valid and got == valid


def test_avg_neighbor_degree_matches_networkx(spark, karate):
    """Per-vertex mean neighbor degree vs networkx average_neighbor_degree
    on karate (unit weights, symmetric table)."""
    import networkx as nx

    from nido_spark.graph import avg_neighbor_degree

    edges, (src, dst, _) = karate
    g = nx.Graph()
    g.add_edges_from(zip(src.tolist(), dst.tolist()))
    want = nx.average_neighbor_degree(g)
    got = {r["v"]: (r["deg"], r["avg_nbr_deg"]) for r in avg_neighbor_degree(edges).collect()}
    assert set(got) == set(want)
    for v, (deg, and_) in got.items():
        assert deg == g.degree(v), v
        assert abs(and_ - want[v]) < 1e-12, v


def test_project_bipartite_counts_and_cap(spark):
    """Hand-checked co-occurrence counts; hub keys above the cap are
    excluded entirely; cap=0 disables the exclusion."""
    from nido_spark.graph import project_bipartite

    pairs = spark.createDataFrame(
        # k1: {a,b,c}; k2: {a,b}; k3 (hub): {a,b,c,d,e}; k4: {c} (no pairs)
        [("k1", "a"), ("k1", "b"), ("k1", "c"), ("k1", "c"),  # dup row -> distinct
         ("k2", "a"), ("k2", "b"),
         ("k3", "a"), ("k3", "b"), ("k3", "c"), ("k3", "d"), ("k3", "e"),
         ("k4", "c")],
        "key string, item string",
    )
    capped = {
        (r["a"], r["b"]): r["n_keys"]
        for r in project_bipartite(pairs, max_items_per_key=4).collect()
    }
    assert capped == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}

    full = {
        (r["a"], r["b"]): r["n_keys"]
        for r in project_bipartite(pairs, max_items_per_key=0).collect()
    }
    # k3 contributes all 10 pairs of {a..e}
    assert full[("a", "b")] == 3 and full[("d", "e")] == 1
    assert len(full) == 10


def test_reciprocity_hand_fixture(spark):
    """Directed fixture: 0->1 & 1->0 reciprocal; 0->2 one-way; 2->2
    self-loop excluded; duplicate-weight rows collapse to distinct pairs."""
    from nido_spark.graph import reciprocity

    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 0, 2.0), (0, 2, 1.0), (2, 2, 5.0), (0, 1, 3.0)],
        "src long, dst long, w double",
    )
    row = reciprocity(edges).first()
    assert row["n_directed"] == 3
    assert row["n_reciprocal"] == 2
    assert abs(row["reciprocity"] - 2 / 3) < 1e-15


def test_reciprocity_matches_networkx(spark):
    """overall_reciprocity parity on a seeded random digraph (self-loops
    stripped on both sides — networkx counts them, we exclude)."""
    import networkx as nx

    from nido_spark.graph import reciprocity

    g = nx.gnp_random_graph(30, 0.15, seed=7, directed=True)
    g.remove_edges_from(nx.selfloop_edges(g))
    edges = spark.createDataFrame(
        [(int(u), int(v), 1.0) for u, v in g.edges()],
        "src long, dst long, w double",
    )
    row = reciprocity(edges).first()
    assert abs(row["reciprocity"] - nx.overall_reciprocity(g)) < 1e-12


def test_in_out_degree(spark):
    """Hand-checked in/out degrees incl. a sink-only vertex and a
    self-loop counting on both sides."""
    from nido_spark.graph import in_out_degree

    edges = spark.createDataFrame(
        [(0, 1, 1.0), (0, 2, 2.0), (1, 2, 4.0), (2, 2, 8.0), (3, 0, 0.5)],
        "src long, dst long, w double",
    )
    got = {
        r["v"]: (r["out_deg"], r["out_w"], r["in_deg"], r["in_w"])
        for r in in_out_degree(edges).collect()
    }
    assert got[0] == (2, 3.0, 1, 0.5)
    assert got[1] == (1, 4.0, 1, 1.0)
    assert got[2] == (1, 8.0, 3, 14.0)
    assert got[3] == (1, 0.5, 0, 0.0)


def test_directed_transcript_edges_symmetrize_invariant(spark):
    """normalize_edges(directed transcript edges) == transcripts_to_edges:
    the directed derivation loses nothing but orientation."""
    from nido_spark.graph import normalize_edges
    from nido_spark.io import (
        synth_transcripts,
        transcripts_to_directed_edges,
        transcripts_to_edges,
    )

    tr = synth_transcripts(spark, 120, seed=11)
    sym = {
        (r["src"], r["dst"]): r["w"]
        for r in transcripts_to_edges(tr, strategy="dense").collect()
    }
    via_directed = {
        (r["src"], r["dst"]): r["w"]
        for r in normalize_edges(
            transcripts_to_directed_edges(tr, strategy="dense")
        ).collect()
    }
    assert via_directed == sym


def test_neighbor_feature_mean_hand_and_numpy(spark):
    """Exact hand fixture (dim 2), then NumPy parity on a random feature
    table — elementwise in-neighbor mean, self-loops dropped, vertices
    with no in-neighbor absent."""
    import numpy as np

    from nido_spark.graph import neighbor_feature_mean

    feats = spark.createDataFrame(
        [(0, [1.0, 10.0]), (1, [2.0, 20.0]), (2, [4.0, 40.0])],
        "id long, feat array<double>",
    )
    edges = spark.createDataFrame(
        [(0, 2), (1, 2), (2, 0), (2, 2)], "src long, dst long"
    )
    got = {
        r["v"]: (r["n_nbrs"], tuple(r["nbr_feat"]))
        for r in neighbor_feature_mean(edges, feats, dim=2).collect()
    }
    assert got == {2: (2, (1.5, 15.0)), 0: (1, (4.0, 40.0))}

    rng = np.random.RandomState(3)
    nv, dim = 40, 5
    fm = rng.rand(nv, dim)
    e = [(int(a), int(b)) for a, b in rng.randint(0, nv, size=(150, 2)) if a != b]
    fdf = spark.createDataFrame(
        [(i, [float(x) for x in fm[i]]) for i in range(nv)],
        "id long, feat array<double>",
    )
    edf = spark.createDataFrame(e, "src long, dst long")
    got = {
        r["v"]: (r["n_nbrs"], np.array(r["nbr_feat"]))
        for r in neighbor_feature_mean(edf, fdf, dim=dim).collect()
    }
    from collections import defaultdict

    nbrs = defaultdict(list)
    for a, b in e:
        nbrs[b].append(a)
    assert set(got) == set(nbrs)
    for v, us in nbrs.items():
        # duplicate edges both count (multigraph mean) — matches the op
        assert got[v][0] == len(us)
        assert np.allclose(got[v][1], fm[us].mean(axis=0), atol=1e-12)


def test_degree_powerlaw_alpha_formula_and_heavy_tail(spark, karate):
    """Pure-Python CSN formula parity on karate, and a BA-shaped random
    graph lands in the documented heavy-tail band."""
    import math

    from nido_spark.graph import degree_powerlaw_alpha
    from nido_spark.io import ba_random_edges

    edges, _ = karate
    row = degree_powerlaw_alpha(edges, dmin=2).first()
    degs = {}
    for r in edges.where(F.col("src") != F.col("dst")).collect():
        degs[r["src"]] = degs.get(r["src"], 0) + 1
    tail = [d for d in degs.values() if d >= 2]
    want = 1.0 + len(tail) / sum(math.log(d / 1.5) for d in tail)
    assert row["n_tail"] == len(tail)
    assert abs(row["alpha"] - want) < 1e-12

    ba = ba_random_edges(spark, 400, m0=3, seed=11)
    a = degree_powerlaw_alpha(ba, dmin=3).first()["alpha"]
    assert 1.5 < a < 4.5  # BA attachment: heavy tail, alpha ~ 2-3.5


def test_degree_powerlaw_alpha_undefined_tail(spark):
    """Fewer than 2 qualifying vertices -> alpha NULL, n_tail exact."""
    from nido_spark.graph import degree_powerlaw_alpha

    e = spark.createDataFrame(
        [(0, 1), (1, 0)], "src long, dst long"
    ).withColumn("w", F.lit(1.0))
    row = degree_powerlaw_alpha(e, dmin=2).first()
    assert row["n_tail"] == 0 and row["alpha"] is None


def test_cooccurrence_pmi_hand_computed(spark):
    """Tiny membership fixture: joints, marginals, pmi = ln(n*c_ab/(c_a*c_b)),
    npmi = pmi / ln(n/c_ab); min_cooc prunes; perfect co-occurrence -> 1.0."""
    import math

    from nido_spark.graph import cooccurrence_pmi

    # keys 1..4; x in all, y in {1,2,3}, z in {1,2}, w only in 4
    rows = [(k, "x") for k in (1, 2, 3, 4)] + [
        (1, "y"), (2, "y"), (3, "y"), (1, "z"), (2, "z"), (4, "w"),
    ]
    pairs = spark.createDataFrame(rows, "key long, item string")
    got = {
        (r["a"], r["b"]): r for r in cooccurrence_pmi(pairs, min_cooc=2).collect()
    }
    # qualifying joints: (x,y)=3, (x,z)=2, (y,z)=2; (w,x)=1 pruned
    assert set(got) == {("x", "y"), ("x", "z"), ("y", "z")}
    n = 4.0
    for (a, b), (ca, cb, cab) in {
        ("x", "y"): (4, 3, 3), ("x", "z"): (4, 2, 2), ("y", "z"): (3, 2, 2),
    }.items():
        r = got[(a, b)]
        assert (r["n_a"], r["n_b"], r["n_ab"]) == (ca, cb, cab)
        pmi = math.log(cab * n / (ca * cb))
        assert abs(r["pmi"] - pmi) < 1e-12
        assert abs(r["npmi"] - pmi / math.log(n / cab)) < 1e-12
    # perfect co-occurrence corner: both items in every key -> npmi 1.0
    full = spark.createDataFrame(
        [(k, i) for k in (1, 2) for i in ("p", "q")], "key long, item string"
    )
    r = cooccurrence_pmi(full, min_cooc=2).first()
    assert r["npmi"] == 1.0 and abs(r["pmi"]) < 1e-12


def test_rich_club_matches_networkx(spark, karate):
    """phi at every emitted knot equals nx.rich_club_coefficient
    (normalized=False) at the same k; counts verified by hand recompute."""
    import networkx as nx

    from nido_spark.graph import rich_club

    edges, (src, dst, _) = karate
    rows = {r["k"]: r for r in rich_club(edges).collect()}
    g = nx.Graph()
    g.add_edges_from(zip(src.tolist(), dst.tolist()))
    want = nx.rich_club_coefficient(g, normalized=False)
    deg = dict(g.degree())
    for k, r in rows.items():
        n_k = sum(1 for d in deg.values() if d > k)
        e_k = sum(1 for u, v in g.edges if deg[u] > k and deg[v] > k)
        assert (r["n_k"], r["e_k"]) == (n_k, e_k)
        if k in want:  # nx emits k in 0..max_deg-1
            assert abs(r["phi"] - want[k]) < 1e-12
        elif n_k < 2:
            assert r["phi"] is None
    assert 0 in rows  # k=0 knot always present
    # monotone thinning: n_k and e_k non-increasing along k
    ks = sorted(rows)
    assert all(
        rows[a]["n_k"] >= rows[b]["n_k"] and rows[a]["e_k"] >= rows[b]["e_k"]
        for a, b in zip(ks, ks[1:])
    )


def test_node2vec_walks_exact_python_replay(spark, karate):
    """node2vec second-order walks EXACTLY replayed by a pure-Python
    exponential race over the same mix: u = (mix+1)/2^31, key =
    round(-ln(u)/alpha, 9), alpha from the (prev, cand) relation; plus
    partition invariance and p/q sensitivity."""
    import math

    from nido_spark.graph import node2vec_walks

    edges = karate[0]
    starts = [0, 5, 11, 33]
    p_, q_ = 2.0, 0.5
    walks = node2vec_walks(edges, starts, length=5, p=p_, q=q_, seed=9).collect()
    got = {}
    for r in walks:
        got.setdefault(r["start"], {})[r["step"]] = r["v"]
    adj = {}
    for r in edges.select("src", "dst").collect():
        adj.setdefault(r["src"], set()).add(r["dst"])
    M20 = 1 << 20
    for s in starts:
        path = [got[s][i] for i in range(6)]
        assert path[0] == s
        prev, cur = None, s
        for step in range(1, 6):
            def race(d):
                m = _bucket_py(
                    ((s % M20) * M20 + (cur % M20)) * M20 + (d % M20),
                    9 + 1_000_003 * step,
                )
                u = (m + 1) / 2147483648.0
                if prev is not None and d == prev:
                    a = 1.0 / p_
                elif prev is not None and d in adj.get(prev, ()):
                    a = 1.0
                else:
                    a = 1.0 / q_
                return (round(-math.log(u) / a, 9), d)

            want = min(adj[cur], key=race)
            assert path[step] == want, (s, step)
            prev, cur = cur, path[step]

    reparted = node2vec_walks(
        edges.repartition(13), starts, length=5, p=p_, q=q_, seed=9
    ).collect()
    assert sorted(map(tuple, walks)) == sorted(map(tuple, reparted))
    other = node2vec_walks(edges, starts, length=5, p=0.25, q=4.0, seed=9).collect()
    assert sorted(map(tuple, other)) != sorted(map(tuple, walks))


def test_node2vec_walks_dead_end_and_bias_direction(spark):
    """Dead ends stop the walk; extreme p (never return) vs tiny p
    (always return) steer step 2 on a star-with-tail fixture."""
    from nido_spark.graph import node2vec_walks

    # path 0 -> 1 -> (dead end), directed
    de = spark.createDataFrame([(0, 1)], "src long, dst long")
    rows = {(r["start"], r["step"]): r["v"] for r in node2vec_walks(de, [0], 4).collect()}
    assert rows == {(0, 0): 0, (0, 1): 1}
    # star: 1 connected to {0, 2}; from 0 step1 -> 1, step2 must RETURN to 0
    # when 1/p dominates (p tiny) and must NOT when 1/p ~ 0 (p huge, q big
    # too so the non-adjacent candidate 2 wins... 2 is non-adjacent to 0 ->
    # alpha(2) = 1/q; make q small so 2 dominates)
    star = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 1)], "src long, dst long"
    )
    back = {
        (r["start"], r["step"]): r["v"]
        for r in node2vec_walks(star, [0], 2, p=1e-9, q=1e9).collect()
    }
    assert back[(0, 2)] == 0  # return edge overwhelmingly weighted
    away = {
        (r["start"], r["step"]): r["v"]
        for r in node2vec_walks(star, [0], 2, p=1e9, q=1e-9).collect()
    }
    assert away[(0, 2)] == 2  # exploration overwhelmingly weighted


def test_butterfly_counts_hand_computed(spark):
    """Two keys sharing items {x,y} -> one butterfly; each of x,y counts
    it once. A third key adds C(3,2)=3 total on the same pair."""
    from nido_spark.graph import butterfly_counts

    pairs = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (3, "y"), (3, "z")],
        "key long, item string",
    )
    got = {r["item"]: r["butterflies"] for r in butterfly_counts(pairs).collect()}
    # codeg(x,y)=3 -> C(3,2)=3 butterflies; codeg(x,z)=codeg(y,z)=1 -> 0
    assert got == {"x": 3, "y": 3}


def test_butterfly_counts_hub_cap(spark):
    """A key above the cap is excluded before wedges are emitted."""
    from nido_spark.graph import butterfly_counts

    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b")]
    hub = [(9, it) for it in ("a", "b", "c", "d", "e")]
    pairs = spark.createDataFrame(rows + hub, "key long, item string")
    got = {r["item"]: r["butterflies"]
           for r in butterfly_counts(pairs, max_items_per_key=4).collect()}
    # hub key 9 excluded: codeg(a,b)=2 -> 1 butterfly each
    assert got == {"a": 1, "b": 1}
    got_nocap = {r["item"]: r["butterflies"]
                 for r in butterfly_counts(pairs, max_items_per_key=0).collect()}
    # with the hub in: codeg(a,b)=3 -> 3 each
    assert got_nocap["a"] == 3 and got_nocap["b"] == 3


def test_wl_flow_fingerprint_isomorphism_and_separation(spark):
    """Structurally identical conversation flows share a fingerprint
    regardless of turn_idx spacing; different tool wiring or role
    structure separates (1-WL distinguishes these tiny multigraphs)."""
    from nido_spark.graph import wl_flow_fingerprint

    flows = {
        "A": [("user", None), ("assistant", None), ("tool", "search"), ("assistant", None)],
        "C": [("user", None), ("assistant", None), ("tool", "web"), ("assistant", None)],
        "D": [("user", None), ("assistant", None), ("user", None), ("assistant", None)],
    }
    rows = []
    for cid, turns in flows.items():
        for i, (r, tl) in enumerate(turns):
            rows.append((cid, i, r, tl))
    # B: A's structure with gappy turn indices — must collide with A
    for i, (r, tl) in enumerate(flows["A"]):
        rows.append(("B", i * 10 + 3, r, tl))
    tr = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, tool string")
    out = {r["conv_id"]: r["wl_fp"] for r in wl_flow_fingerprint(tr).collect()}
    assert out["A"] == out["B"]
    assert len({out["A"], out["C"], out["D"]}) == 3


def test_wl_flow_fingerprint_partition_invariant(spark):
    """The fingerprint is pure modular arithmetic over the conversation's
    own rows — repartitioning the input must not change a single value."""
    from nido_spark.graph import wl_flow_fingerprint
    from nido_spark.io import synth_transcripts

    tr = synth_transcripts(spark, 60, seed=11)
    a = {r["conv_id"]: tuple(r) for r in wl_flow_fingerprint(tr).collect()}
    b = {
        r["conv_id"]: tuple(r)
        for r in wl_flow_fingerprint(tr.repartition(13)).collect()
    }
    assert a == b and len(a) == 60


def test_temporal_reachability_time_gate(spark):
    """Causality gate: x->y fires at t=5, y->z fired at t=3 (BEFORE
    influence reaches y), so z is NOT reachable; y->w at t=9 is. A plain
    BFS on the same edges would claim z — the time gate is the point."""
    from nido_spark.graph import temporal_reachability

    te = spark.createDataFrame(
        [("x", "y", 5), ("y", "z", 3), ("y", "w", 9)],
        "a string, b string, t long",
    )
    out = {r["v"]: r["arr"] for r in temporal_reachability(te, ["x"]).collect()}
    assert out == {"x": 0, "y": 5, "w": 9}


def test_temporal_reachability_equal_time_hop_allowed(spark):
    """t >= arr: a transition at exactly the arrival instant counts
    (same-turn relay), and the earliest of several valid arrivals wins."""
    from nido_spark.graph import temporal_reachability

    te = spark.createDataFrame(
        [("s", "a", 4), ("a", "b", 4), ("s", "b", 7)],
        "a string, b string, t long",
    )
    out = {r["v"]: r["arr"] for r in temporal_reachability(te, ["s"]).collect()}
    assert out == {"s": 0, "a": 4, "b": 4}


def test_temporal_edges_bridge_conversations_via_tools(spark):
    """On the synth fixture, reachability from a popular tool crosses into
    conversations the seed tool itself appears in — and only turns at or
    after the seed's first firing are reached (spot-check the invariant:
    every non-seed arrival is a real edge time >= 0)."""
    from nido_spark.graph import (
        temporal_reachability,
        transcripts_to_temporal_edges,
    )
    from nido_spark.io import synth_transcripts

    te = transcripts_to_temporal_edges(synth_transcripts(spark, 120, seed=42))
    out = temporal_reachability(te, ["tool:tool_00"]).collect()
    convs = {r["v"].split(":")[0] for r in out if r["v"].startswith("conv_")}
    assert len(convs) > 1  # crossed conversation boundaries
    times = [r["arr"] for r in out if r["arr"] > 0]
    assert times and min(times) >= 1_700_000_000


def test_attribute_assortativity_matches_networkx(spark):
    """Newman's directed attribute assortativity on the synth transcript
    actor graph equals networkx's coefficient on the multigraph expansion
    (weights = multi-edge counts); dialogue alternation makes it strongly
    negative."""
    import networkx as nx

    from nido_spark.graph import actor_class, attribute_assortativity
    from nido_spark.io import synth_transcripts, transcript_string_edges

    se = transcript_string_edges(synth_transcripts(spark, 120, seed=42), directed=True)
    names = se.select(F.col("a").alias("name")).union(se.select("b")).distinct()
    labels = names.select("name", actor_class(F.col("name")).alias("cls"))
    r = attribute_assortativity(se, labels)
    G = nx.MultiDiGraph()
    for row in se.collect():
        for _ in range(int(row["w"])):
            G.add_edge(row["a"], row["b"])

    def cls(n):
        if n.startswith("tool:"):
            return "tool"
        if n.startswith("conv:"):
            return "conv"
        return n.split(":")[-1]

    nx.set_node_attributes(G, {n: cls(n) for n in G.nodes}, "cls")
    want = nx.attribute_assortativity_coefficient(G, "cls")
    assert abs(r - want) < 1e-9
    assert r < -0.3


def test_disparity_filter_hand_star_and_karate_replay(spark, karate):
    """Star with one dominant spoke: only the heavy edge survives (its
    center-side alpha = (3/13)^3 ~ 0.0123; the light spokes get ~0.787 and
    the leaf side is always pow(0,0)=1). Karate: survivor set and alphas
    == a pure-Python replay of the min-over-endpoints rule."""
    from nido_spark.graph import disparity_filter

    pairs = [(0, 1, 10.0), (0, 2, 1.0), (0, 3, 1.0), (0, 4, 1.0)]
    rows = [(a, b, w) for a, b, w in pairs] + [(b, a, w) for a, b, w in pairs]
    edges = spark.createDataFrame(rows, "src long, dst long, w double")
    got = {
        (r["a"], r["b"]): r["alpha"]
        for r in disparity_filter(edges, alpha=0.05).collect()
    }
    assert set(got) == {(0, 1)}
    assert abs(got[(0, 1)] - (3.0 / 13.0) ** 3) < 1e-9
    everything = {
        (r["a"], r["b"]): r["alpha"]
        for r in disparity_filter(edges, keep_all=True).collect()
    }
    assert len(everything) == 4
    assert abs(everything[(0, 2)] - (12.0 / 13.0) ** 3) < 1e-9

    kedges, (src, dst, w) = karate
    got = {
        (r["a"], r["b"]): r["alpha"]
        for r in disparity_filter(kedges, alpha=0.5).collect()
    }
    ks: dict[int, int] = {}
    ss: dict[int, float] = {}
    for a, b, x in zip(src, dst, w):
        if a != b:
            ks[int(a)] = ks.get(int(a), 0) + 1
            ss[int(a)] = ss.get(int(a), 0.0) + float(x)
    want: dict[tuple[int, int], float] = {}
    for a, b, x in zip(src, dst, w):
        a, b, x = int(a), int(b), float(x)
        if a == b:
            continue
        key = (min(a, b), max(a, b))
        side = (1.0 - x / ss[a]) ** (ks[a] - 1)
        want[key] = min(want.get(key, 1.0), side)
    survivors = {k: round(v, 9) for k, v in want.items() if round(v, 9) < 0.5}
    assert got == survivors and len(got) > 0


def test_burt_constraint_networkx_parity(spark, karate):
    """constraint == networkx.constraint on karate (unit weights) and on
    a weighted toy graph; the hub cap excludes wedges through the capped
    contact only (replayed in pure Python)."""
    import networkx as nx

    from nido_spark.graph import burt_constraint

    kedges, (src, dst, w) = karate
    got = {r["v"]: r["constraint"] for r in burt_constraint(kedges).collect()}
    g = nx.Graph()
    for a, b, x in zip(src, dst, w):
        if a != b:
            g.add_edge(int(a), int(b), weight=float(x))
    want = nx.constraint(g, weight="weight")
    assert set(got) == set(g.nodes)
    for v in g.nodes:
        assert abs(got[v] - want[v]) < 1e-7, v

    # weighted triangle + pendant
    pairs = [(0, 1, 2.0), (1, 2, 1.0), (0, 2, 1.0), (2, 3, 3.0)]
    rows = [(a, b, x) for a, b, x in pairs] + [(b, a, x) for a, b, x in pairs]
    edges = spark.createDataFrame(rows, "src long, dst long, w double")
    got = {r["v"]: r["constraint"] for r in burt_constraint(edges).collect()}
    g2 = nx.Graph()
    for a, b, x in pairs:
        g2.add_edge(a, b, weight=x)
    want2 = nx.constraint(g2, weight="weight")
    for v in g2.nodes:
        assert abs(got[v] - want2[v]) < 1e-9, v

    # cap semantics: wedges through vertex 2 (deg 3) are dropped at cap 2
    capped = {
        r["v"]: r["constraint"]
        for r in burt_constraint(edges, max_wedge_degree=2).collect()
    }
    frac = {}
    deg, s = {}, {}
    for a, b, x in rows:
        deg[a] = deg.get(a, 0) + 1
        s[a] = s.get(a, 0.0) + x
    for a, b, x in rows:
        frac[(a, b)] = x / s[a]
    want_cap = {}
    for v in s:
        tot = 0.0
        for (a, j), p in frac.items():
            if a != v:
                continue
            ind = sum(
                frac[(v, q)] * frac[(q, j)]
                for q in s
                if q != j and (v, q) in frac and (q, j) in frac and deg[q] <= 2
            )
            tot += (p + ind) ** 2
        want_cap[v] = round(tot, 9)
    assert capped == want_cap


def _brute_triads(edges):
    es = {(a, b) for a, b in edges if a != b}
    paths = [(a, b, c) for a, b in es for b2, c in es if b2 == b and a != c]
    n_cyc = sum(1 for a, b, c in paths if (c, a) in es) // 3
    n_trn = sum(1 for a, b, c in paths if (a, c) in es)
    return len(paths), n_cyc, n_trn


def test_triad_census_bruteforce_random_digraph(spark):
    import random

    from nido_spark.graph import triad_census

    rng = random.Random(5)
    edges = list({(rng.randrange(25), rng.randrange(25)) for _ in range(160)})
    want = _brute_triads(edges)
    df = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src long, dst long, w double"
    )
    row = triad_census(df).collect()[0]
    assert (row["n_paths"], row["n_cyclic"], row["n_transitive"]) == want


def test_triad_census_hand_motifs(spark):
    from nido_spark.graph import triad_census

    # one 3-cycle + one feed-forward triangle, disjoint
    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (10, 12)]
    df = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src long, dst long, w double"
    )
    row = triad_census(df).collect()[0]
    # paths: cycle contributes 3 ordered 2-paths, ffw contributes 1 (10->11->12)
    assert (row["n_paths"], row["n_cyclic"], row["n_transitive"]) == (4, 1, 1)


def test_triad_census_mid_degree_cap_excludes_hub_paths(spark):
    from nido_spark.graph import triad_census

    # hub b=0: in {1..4}->0, out 0->{5..8}; plus a clean cycle 20->21->22->20
    edges = [(i, 0) for i in range(1, 5)] + [(0, j) for j in range(5, 9)]
    edges += [(20, 21), (21, 22), (22, 20)]
    df = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src long, dst long, w double"
    )
    full = triad_census(df).collect()[0]
    assert full["n_paths"] == 16 + 3
    capped = triad_census(df, max_mid_degree=4).collect()[0]
    # hub's in*out = 16 > 4 -> its 16 paths vanish; cycle middles are 1*1
    assert (capped["n_paths"], capped["n_cyclic"]) == (3, 1)


def test_transcript_per_turn_text_equality_under_stable_order(spark):
    """The input-table per-row invariant (BASELINE input_hint): every
    (conv_id, turn_idx) row of the DISTRIBUTED transcript generator —
    including the TEXT payload and timestamp — equals the driver-side
    reference rendering, under the stable (conv_id, turn_idx) order,
    for ANY partitioning. This is the 'per-turn text equality under
    stable turn ordering' contract every downstream edge derivation
    rests on."""
    from nido_spark.io import synth_transcripts, synth_transcripts_pandas

    ref = (
        synth_transcripts_pandas(40, seed=9)
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    for parts in (1, 7):
        got = (
            synth_transcripts(spark, 40, seed=9, partitions=parts)
            .toPandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        assert list(got.columns) == list(ref.columns)
        for c in ("conv_id", "turn_idx", "role", "text", "tool"):
            assert got[c].where(got[c].notna(), None).tolist() == \
                   ref[c].where(ref[c].notna(), None).tolist(), (parts, c)
        assert (got["ts"].astype("int64") == ref["ts"].astype("int64")).all()


def test_graph_profile_hand_counts(spark):
    """Profile of a known graph: P3 symmetric + one self-loop; every
    column hand-checked (incl. the self-loop exclusion from degrees and
    the // 2 undirected count)."""
    from nido_spark.graph import graph_profile

    rows = [(0, 1, 1.0), (1, 0, 1.0), (1, 2, 1.0), (2, 1, 1.0), (2, 2, 5.0)]
    e = spark.createDataFrame(rows, "src long, dst long, w double")
    r = graph_profile(e).first()
    assert (r["nv"], r["ne_directed"], r["ne_undirected"]) == (3, 5, 2)
    assert r["n_self_loops"] == 1
    assert r["n_degree_zero"] == 0
    assert (r["min_deg"], r["max_deg"]) == (1, 2)
    assert r["avg_deg"] == round(4 / 3, 9)
    assert r["density"] == round(2 / 3, 9)


def test_graph_profile_self_loop_only_vertex(spark):
    """A vertex whose ONLY edges are self-loops has simple degree 0: it
    must appear in n_degree_zero and pull min_deg down to 0 (the degree
    table can't see it, so the profile derives this from nv vs the
    degree-table row count)."""
    from nido_spark.graph import graph_profile

    rows = [(1, 2, 1.0), (2, 1, 1.0), (3, 3, 1.0)]
    e = spark.createDataFrame(rows, "src long, dst long, w double")
    r = graph_profile(e).first()
    assert r["nv"] == 3
    assert r["n_self_loops"] == 1
    assert r["n_degree_zero"] == 1
    assert (r["min_deg"], r["max_deg"]) == (0, 1)
