"""Round-6 optimization probes — the noop-sink isolation harness behind
OPTIMIZATION_r06.md (guide §1.4). bench.py is FROZEN for measurement; these
probes time individual operator stages so per-change evidence does not
depend on the full-suite draw noise.

Usage (env as bench.py):

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench_extra.py <probe>

probes: dedup-stages | louvain-phases | jaccard-join | q1 | floor <size>
"""

from __future__ import annotations

import json
import os
import sys
import time


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _timed(name, fn, out):
    t0 = time.time()
    fn()
    out[name] = round(time.time() - t0, 3)


def dedup_stages(sf_dir: str, cpus: int) -> None:
    """Isolate q9's three stages (signatures / LSH pairs / verify) with the
    noop sink, each downstream stage fed MATERIALIZED upstream output so
    the timings do not overlap."""
    from pyspark.sql import functions as F  # noqa: F401

    import nido_spark.dedup as D
    from nido_spark.plans import truncate_lineage
    from nido_spark.session import get_spark

    spark = get_spark("bx_dedup", cores=cpus, shuffle_partitions=cpus)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    docs.count()
    out: dict[str, float] = {}
    spark.sparkContext.setJobDescription("q9a signatures")
    _timed("signatures_noop", lambda: _noop(D.minhash_signatures(docs)), out)
    sigs = truncate_lineage(D.minhash_signatures(docs))
    spark.sparkContext.setJobDescription("q9b lsh pairs")
    _timed(
        "lsh_pairs_noop",
        lambda: _noop(D.lsh_candidate_pairs(sigs, 8, 4, 50_000)),
        out,
    )
    cands = truncate_lineage(D.lsh_candidate_pairs(sigs, 8, 4, 50_000))
    out["n_candidates"] = cands.count()
    spark.sparkContext.setJobDescription("q9c verify")
    _timed(
        "verify_noop",
        lambda: _noop(D.jaccard_verify(docs, cands, "text", 5, 0.6)),
        out,
    )
    spark.sparkContext.setJobDescription(None)
    _timed("full_minhash_dedup", lambda: D.minhash_dedup(docs, threshold=0.6).count(), out)
    print(json.dumps(out))
    spark.stop()


def louvain_phases(sf_dir: str, cpus: int) -> None:
    """Per-part wall clock of the q4 run: pin / distributed sweeps /
    per-sweep Q / the NumPy local tail — the evidence for the
    local_threshold and small-codegen crossovers."""
    import nido_spark.louvain as L
    from nido_spark.io import lineitem_edges
    from nido_spark.session import get_spark

    spark = get_spark("bx_lv", cores=cpus, shuffle_partitions=cpus)
    edges = lineitem_edges(spark, sf_dir).cache()
    ne = edges.count()
    log: list[tuple[str, float]] = []
    for attr, name in (
        ("louvain_sweep", "sweep_build"),
        ("modularity", "modularity"),
        ("_finish_local", "local_tail"),
    ):
        orig = getattr(L, attr)

        def wrap(*a, _o=orig, _n=name, **k):
            t0 = time.time()
            r = _o(*a, **k)
            log.append((_n, time.time() - t0))
            return r

        setattr(L, attr, wrap)
    for draw in range(2):
        log.clear()
        t0 = time.time()
        res = L.louvain(edges, nbatches=4)
        total = time.time() - t0
        agg: dict[str, list] = {}
        for n, dt in log:
            agg.setdefault(n, [0.0, 0])
            agg[n][0] += dt
            agg[n][1] += 1
        print(
            json.dumps(
                {
                    "draw": draw,
                    "n_edges": ne,
                    "total_sec": round(total, 2),
                    "Q": round(res.modularity, 6),
                    "sweeps": res.total_sweeps,
                    "parts": {k: [round(v[0], 2), v[1]] for k, v in agg.items()},
                }
            )
        )
    spark.stop()


def jaccard_join_draws(sf_dir: str, cpus: int, n: int = 4) -> None:
    """q20 draw stability: the staged (materialize_stages=True) plan vs
    the fused lazy plan, n draws each."""
    from pyspark.sql import functions as F

    import nido_spark.dedup as D
    from nido_spark.session import get_spark

    spark = get_spark("bx_jj", cores=cpus, shuffle_partitions=cpus)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    docs.count()
    half = docs.where(F.col("doc_id") % 2 == 0)
    out = {"staged": [], "lazy": []}
    for _ in range(n):
        t0 = time.time()
        D.jaccard_join(half, threshold=0.8).count()
        out["staged"].append(round(time.time() - t0, 2))
    for _ in range(n):
        t0 = time.time()
        D.jaccard_join(half, threshold=0.8, materialize_stages=False).count()
        out["lazy"].append(round(time.time() - t0, 2))
    print(json.dumps(out))
    spark.stop()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    probe = sys.argv[1] if len(sys.argv) > 1 else "dedup-stages"
    if probe == "dedup-stages":
        dedup_stages(sf_dir, cpus)
    elif probe == "louvain-phases":
        louvain_phases(sf_dir, cpus)
    elif probe == "jaccard-join":
        jaccard_join_draws(sf_dir, cpus)
    else:
        raise SystemExit(f"unknown probe {probe!r}")


if __name__ == "__main__":
    main()
