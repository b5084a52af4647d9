"""Command-line entry point mirroring the reference binary's surface.

Reference CLI (``/root/reference/main.cpp:30-78``, getopt "f:p:r:cb:i:t:ho:"):

====  =============================================  =========================
flag  reference meaning                              nido_spark rendering
====  =============================================  =========================
-f    binary CSR graph file                          parquet path: an edge
                                                     table (src,dst,w), a
                                                     transcripts table (the
                                                     production input_hint
                                                     shape — auto-detected by
                                                     schema), or a TPC-H-ish
                                                     dir containing
                                                     lineitem.parquet
-r    "<nv> <edge-factor>" synthetic graph           --random "NV M0" (seeded
                                                     BA-ish generator, io.py)
-b    batches per sweep (default 2)                  same (louvain nbatches)
-i    max sweeps per phase (default 500)             same (max_loops)
-t    tau convergence threshold (default 1e-6)       same (tol / tol_phase)
-c    Luby-color vertices before scheduling          runs the coloring
                                                     diagnostic; batching
                                                     replaces color-order
                                                     scheduling in Spark, so
                                                     the labels are reported,
                                                     not used to reorder
-o    write one community id per line                labels parquet dir
-p    GPU capacity partition args                    N/A (Spark partitioning)
====  =============================================  =========================

Also prints the load-time graph stats the reference prints
(``graph.cpp:280-320``): nv, directed edge count, mass, max order.

Usage::

    python -m nido_spark -f /root/testdata/sf0.001 -b 4 -o /tmp/labels
    python -m nido_spark --random "2000 4" -b 8 -t 1e-6
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _load_edges(spark: SparkSession, path: str) -> DataFrame:
    """Auto-detect the input shape: edge table / transcripts / TPC-H dir."""
    import os

    from nido_spark.graph import normalize_edges
    from nido_spark.io import lineitem_edges, read_transcripts, transcripts_to_edges

    if os.path.isdir(path) and os.path.exists(os.path.join(path, "lineitem.parquet")):
        return lineitem_edges(spark, path)
    df = spark.read.parquet(path)
    cols = set(df.columns)
    if {"src", "dst", "w"} <= cols:
        e = df.select("src", "dst", "w")
        # an already-symmetric table (e.g. one this engine wrote) must NOT
        # be mirrored again — that doubles every weight. validate_edges'
        # asym==0 detects the canonical form exactly.
        from nido_spark.graph import validate_edges

        already_symmetric = validate_edges(e)["asym"] == 0
        return normalize_edges(e, symmetrize=not already_symmetric)
    if {"conv_id", "turn_idx", "role"} <= cols:
        return transcripts_to_edges(read_transcripts(spark, path))
    raise SystemExit(
        f"unrecognized input schema {sorted(cols)}: need (src,dst,w), "
        f"transcripts (conv_id,turn_idx,role,...), or a dir with lineitem.parquet"
    )


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="nido_spark",
        description="Batched multi-phase Louvain over a link graph (PySpark)",
    )
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("-f", "--file", help="input parquet (edges / transcripts / TPC-H dir)")
    src.add_argument("-r", "--random", metavar='"NV M0"',
                     help="synthetic BA-ish graph: vertex count + edge factor")
    p.add_argument("-b", "--nbatches", type=int, default=2,
                   help="batches per sweep (reference DEFAULT_BATCHES=2)")
    p.add_argument("-i", "--max-loops", type=int, default=500,
                   help="max sweeps per phase (reference DEFAULT_ITERATIONS=500)")
    p.add_argument("-t", "--tau", type=float, default=1e-6,
                   help="convergence threshold (reference DEFAULT_THRESHOLD=1e-6)")
    p.add_argument("-c", "--coloring", action="store_true",
                   help="run the Luby/JP coloring diagnostic before Louvain")
    p.add_argument("-o", "--output", help="labels parquet output dir")
    p.add_argument("--cores", type=int, default=None, help="local[N] cores")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--gamma", type=float, default=1.0,
                   help="Louvain resolution (Reichardt-Bornholdt; 1.0 = classic Q)")
    p.add_argument("--json", action="store_true", help="emit one JSON line of metrics")
    p.add_argument(
        "-a", "--algo", default="louvain",
        choices=["louvain", "louvain-refined", "pagerank", "cc", "lpa",
                 "triangles", "k-core", "sssp", "hits", "betweenness", "msf",
                 "scc", "onion", "fiedler", "backbone", "ecg", "leiden"],
        help="algorithm to run (default: the reference's Louvain; "
             "louvain-refined chains the Leiden-style connected split)",
    )
    p.add_argument("--source", type=int, default=None,
                   help="source vertex (sssp; betweenness uses it as the "
                        "single sampled source when given)")
    args = p.parse_args(argv)

    from nido_spark import algos as A
    from nido_spark import graph as G
    from nido_spark import louvain as L
    from nido_spark.io import ba_random_edges, write_labels
    from nido_spark.session import get_spark

    spark = get_spark("nido_spark_cli", cores=args.cores)
    t0 = time.time()
    if args.random:
        parts = args.random.split()
        nv, m0 = int(parts[0]), int(parts[1]) if len(parts) > 1 else 4
        edges = ba_random_edges(spark, nv, m0, seed=args.seed)
    else:
        edges = _load_edges(spark, args.file)
    edges = edges.cache()

    # load-time stats, as the reference prints after CSR load
    stats = G.validate_edges(edges)
    stats["max_order"] = G.max_order(edges)
    stats["mass"] = G.mass(edges)
    stats["load_sec"] = round(time.time() - t0, 2)
    print(f"graph: nv={stats['nv']} ne_directed={stats['ne_directed']} "
          f"mass={stats['mass']:.3f} max_order={stats['max_order']} "
          f"asym={stats['asym']} [{stats['load_sec']}s]")
    if stats["asym"] != 0:
        raise SystemExit("input edge table failed symmetry validation")

    metrics: dict = {"graph": stats}
    if args.coloring:
        t1 = time.time()
        colors = A.luby_mis_coloring(edges, seed=args.seed)
        ncolors = colors.agg({"color": "max"}).first()[0]
        ncolors = 0 if ncolors is None else int(ncolors) + 1
        metrics["coloring"] = {"n_colors": ncolors, "sec": round(time.time() - t1, 2)}
        print(f"coloring: {ncolors} colors [{metrics['coloring']['sec']}s]")

    t2 = time.time()
    out_df = None
    if args.algo in ("louvain", "louvain-refined"):
        res = L.louvain(
            edges, nbatches=args.nbatches, tol=args.tau,
            max_loops=args.max_loops, tol_phase=args.tau, gamma=args.gamma,
        )
        metrics["louvain"] = {
            "modularity": res.modularity,
            "phases": res.n_phases,
            "sweeps": res.total_sweeps,
            "sec": round(time.time() - t2, 2),
        }
        print(f"louvain: Q={res.modularity:.6f} phases={res.n_phases} "
              f"sweeps={res.total_sweeps} [{metrics['louvain']['sec']}s]")
        out_df = res.labels
        if args.algo == "louvain-refined":
            out_df = A.refine_connected(res.labels, edges)
            n_before = res.labels.select("comm").distinct().count()
            n_after = out_df.select("comm").distinct().count()
            metrics["refine"] = {"n_comms_before": n_before, "n_comms_after": n_after}
            print(f"refine: {n_before} -> {n_after} communities (connected split)")
    elif args.algo == "leiden":
        res = L.leiden(
            edges, nbatches=args.nbatches, tol=args.tau,
            max_loops=args.max_loops, tol_phase=args.tau, gamma=args.gamma,
        )
        metrics["leiden"] = {
            "modularity": res.modularity,
            "phases": res.n_phases,
            "sweeps": res.total_sweeps,
            "sec": round(time.time() - t2, 2),
        }
        print(f"leiden: Q={res.modularity:.6f} phases={res.n_phases} "
              f"sweeps={res.total_sweeps} [{metrics['leiden']['sec']}s]")
        out_df = res.labels
    elif args.algo == "pagerank":
        out_df = A.pagerank(edges, max_iters=args.max_loops if args.max_loops < 500 else 20,
                            tol=args.tau)
        metrics["pagerank"] = {"sec": round(time.time() - t2, 2)}
        print(f"pagerank: done [{metrics['pagerank']['sec']}s]")
    elif args.algo == "cc":
        out_df = A.connected_components(edges)
        n = out_df.select("comm").distinct().count()
        metrics["cc"] = {"n_components": n, "sec": round(time.time() - t2, 2)}
        print(f"cc: {n} components [{metrics['cc']['sec']}s]")
    elif args.algo == "scc":
        # directed SCC; on a symmetric edge table this equals cc
        out_df = A.strongly_connected_components(edges)
        n = out_df.select("comm").distinct().count()
        metrics["scc"] = {"n_components": n, "sec": round(time.time() - t2, 2)}
        print(f"scc: {n} components [{metrics['scc']['sec']}s]")
    elif args.algo == "lpa":
        out_df = A.label_propagation(edges, nbatches=args.nbatches)
        metrics["lpa"] = {"sec": round(time.time() - t2, 2)}
        print(f"lpa: done [{metrics['lpa']['sec']}s]")
    elif args.algo == "triangles":
        n = A.triangle_count(edges)
        metrics["triangles"] = {"n": n, "sec": round(time.time() - t2, 2)}
        print(f"triangles: {n} [{metrics['triangles']['sec']}s]")
    elif args.algo == "k-core":
        out_df = A.k_core(edges)
        metrics["k_core"] = {"sec": round(time.time() - t2, 2)}
        print(f"k-core: done [{metrics['k_core']['sec']}s]")
    elif args.algo == "sssp":
        if args.source is None:
            raise SystemExit("sssp needs --source <vertex id>")
        out_df = A.sssp(edges, source=args.source)
        reached = out_df.where("dist is not null").count()
        metrics["sssp"] = {"reached": reached, "sec": round(time.time() - t2, 2)}
        print(f"sssp: {reached} reached from {args.source} "
              f"[{metrics['sssp']['sec']}s]")
    elif args.algo == "hits":
        out_df = A.hits(edges)
        metrics["hits"] = {"sec": round(time.time() - t2, 2)}
        print(f"hits: done [{metrics['hits']['sec']}s]")
    elif args.algo == "msf":
        out_df = A.boruvka_msf(edges)
        agg = out_df.agg(
            F.count(F.lit(1)).alias("n"), F.sum("w").alias("tw")
        ).first()
        metrics["msf"] = {"n_edges": int(agg["n"]),
                          "total_weight": float(agg["tw"] or 0.0),
                          "sec": round(time.time() - t2, 2)}
        print(f"msf: {metrics['msf']['n_edges']} edges "
              f"total_w={metrics['msf']['total_weight']:.3f} "
              f"[{metrics['msf']['sec']}s]")
    elif args.algo == "onion":
        out_df = A.onion_decomposition(edges)
        agg = out_df.agg(
            F.max("core").alias("kmax"), F.max("layer").alias("lmax")
        ).first()
        metrics["onion"] = {"max_core": int(agg["kmax"]),
                            "n_layers": int(agg["lmax"]),
                            "sec": round(time.time() - t2, 2)}
        print(f"onion: max core {metrics['onion']['max_core']}, "
              f"{metrics['onion']['n_layers']} layers "
              f"[{metrics['onion']['sec']}s]")
    elif args.algo == "fiedler":
        out_df = A.fiedler_vector(edges, n_iters=40)
        n1 = out_df.where("side = 1").count()
        n0 = out_df.where("side = 0").count()
        metrics["fiedler"] = {"side1": n1, "side0": n0,
                              "sec": round(time.time() - t2, 2)}
        print(f"fiedler: bisection {n1}/{n0} [{metrics['fiedler']['sec']}s]")
    elif args.algo == "backbone":
        out_df = G.disparity_filter(edges, alpha=0.05)
        n_kept = out_df.count()
        n_all = edges.where("src < dst").count()
        metrics["backbone"] = {"kept": n_kept, "of": n_all,
                               "sec": round(time.time() - t2, 2)}
        print(f"backbone: kept {n_kept}/{n_all} edges at alpha=0.05 "
              f"[{metrics['backbone']['sec']}s]")
    elif args.algo == "ecg":
        res = L.ecg(
            edges, nbatches=args.nbatches, tol=args.tau,
            max_loops=args.max_loops, tol_phase=args.tau, gamma=args.gamma,
        )
        metrics["ecg"] = {
            "modularity_reweighted": res.modularity,
            "phases": res.n_phases,
            "sweeps": res.total_sweeps,
            "sec": round(time.time() - t2, 2),
        }
        print(f"ecg: Q'={res.modularity:.6f} (reweighted graph) "
              f"phases={res.n_phases} sweeps={res.total_sweeps} "
              f"[{metrics['ecg']['sec']}s]")
        out_df = res.labels
    elif args.algo == "betweenness":
        srcs = ([args.source] if args.source is not None
                else [r["src"] for r in
                      edges.select("src").distinct().orderBy("src").limit(16).collect()])
        out_df = A.betweenness_sampled(edges, srcs)
        metrics["betweenness"] = {"n_sources": len(srcs),
                                  "sec": round(time.time() - t2, 2)}
        print(f"betweenness: {len(srcs)} sources [{metrics['betweenness']['sec']}s]")

    if args.output and out_df is not None:
        if args.algo in ("louvain", "louvain-refined", "leiden"):
            write_labels(out_df, args.output, order_by_vertex=True)
        else:
            out_df.write.mode("overwrite").parquet(args.output)
        print(f"labels -> {args.output}")
    if args.json:
        print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    sys.exit(main())
