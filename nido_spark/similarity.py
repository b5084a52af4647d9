"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``     — brute-force exact top-k: broadcast the (small) query
                        set against the corpus; dot products as Catalyst
                        ``aggregate(zip_with(...))`` expressions (JVM-side,
                        no Python). The correctness baseline.
- ``lsh_ann_topk``    — random-hyperplane LSH: b-bit signatures, bucket
                        join on signature prefix bands, exact re-rank inside
                        buckets. The 100 TB path: candidates per query drop
                        from |corpus| to the bucket occupancy.
- ``near_duplicates`` — embedding-cosine near-dup pairs (cosine >= tau) via
                        the same LSH bucketing, corpus-vs-corpus.

Hyperplanes are seeded deterministically (never wall-clock) and shipped as
literal arrays in the plan — no driver-side state on the executors beyond
the expression tree.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _norm(col):
    return F.sqrt(F.aggregate(col, F.lit(0.0), lambda a, x: a + x.cast("double") * x))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors: (query_id, nbr_id, cos, rank).

    ``queries`` is broadcast — the intended shape is few queries vs a huge
    corpus. Self-matches (same id) are excluded. Ties broken by nbr_id."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("c_vec"))
    cos = _dot(F.col("q_vec"), F.col("c_vec")) / (
        F.greatest(_norm(F.col("q_vec")) * _norm(F.col("c_vec")), F.lit(1e-12))
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id", cos.alias("cos"))
    )
    ranked = scored.groupBy("query_id").agg(
        F.slice(
            F.sort_array(
                F.collect_list(F.struct(F.col("cos"), (-F.col("nbr_id")).alias("negid"), F.col("nbr_id"))),
                asc=False,
            ),
            1,
            k,
        ).alias("top")
    )
    return ranked.select(
        "query_id",
        F.posexplode("top").alias("pos", "t"),
    ).select(
        "query_id",
        F.col("t.nbr_id").alias("nbr_id"),
        F.col("t.cos").alias("cos"),
        (F.col("pos") + 1).alias("rank"),
    )


def _hyperplanes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim))


def signature_col(vec_col, planes: np.ndarray):
    """Bit-signature expression: bit i = sign(vec . plane_i)."""
    sig = None
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(vec_col, plane) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseOR(term)
    return sig


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_bits: int = 16,
    n_bands: int = 4,
    dim: int | None = None,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: random-hyperplane signatures, banded bucket join,
    exact cosine re-rank within candidate set. Recall grows with n_bands
    (any shared band -> candidate)."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_bits, seed)
    rows_per_band = n_bits // n_bands

    def banded(df, side):
        sig = signature_col(F.col(vec_col), planes)
        return df.select(
            F.col(id_col).alias(f"{side}_id"),
            F.col(vec_col).alias(f"{side}_vec"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("band"),
                            F.shiftrightunsigned(sig, j * rows_per_band)
                            .bitwiseAND(F.lit((1 << rows_per_band) - 1))
                            .alias("key"),
                        )
                        for j in range(n_bands)
                    ]
                )
            ).alias("bk"),
        ).select(f"{side}_id", f"{side}_vec", "bk.band", "bk.key")

    cb = banded(corpus, "nbr")
    qb = banded(queries, "query")
    cos = _dot(F.col("query_vec"), F.col("nbr_vec")) / (
        F.greatest(_norm(F.col("query_vec")) * _norm(F.col("nbr_vec")), F.lit(1e-12))
    )
    cands = (
        cb.join(qb, ["band", "key"])
        .where(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id", "query_vec", "nbr_vec")
        .distinct()
        .select("query_id", "nbr_id", cos.alias("cos"))
    )
    ranked = cands.groupBy("query_id").agg(
        F.slice(
            F.sort_array(
                F.collect_list(F.struct("cos", (-F.col("nbr_id")).alias("negid"), "nbr_id")), asc=False
            ),
            1,
            k,
        ).alias("top")
    )
    return ranked.select("query_id", F.posexplode("top").alias("pos", "t")).select(
        "query_id",
        F.col("t.nbr_id").alias("nbr_id"),
        F.col("t.cos").alias("cos"),
        (F.col("pos") + 1).alias("rank"),
    )


def near_duplicates(
    corpus: DataFrame,
    tau: float = 0.95,
    n_bits: int = 16,
    n_bands: int = 4,
    dim: int | None = None,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(a, b, cos) embedding near-dup pairs with cosine >= tau, LSH-bucketed
    corpus self-join (a < b)."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_bits, seed)
    rows_per_band = n_bits // n_bands
    sig = signature_col(F.col(vec_col), planes)
    banded = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.shiftrightunsigned(sig, j * rows_per_band)
                        .bitwiseAND(F.lit((1 << rows_per_band) - 1))
                        .alias("key"),
                    )
                    for j in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "vec", "bk.band", "bk.key")
    left = banded.select("band", "key", F.col("id").alias("a"), F.col("vec").alias("va"))
    right = banded.select("band", "key", F.col("id").alias("b"), F.col("vec").alias("vb"))
    cos = _dot(F.col("va"), F.col("vb")) / (
        F.greatest(_norm(F.col("va")) * _norm(F.col("vb")), F.lit(1e-12))
    )
    return (
        left.join(right, ["band", "key"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "va", "vb")
        .distinct()
        .select("a", "b", cos.alias("cos"))
        .where(F.col("cos") >= tau)
    )
