"""End-to-end training-data corpus preparation — the composition a 100 TB
pipeline actually runs, as one operator:

    exact dedup  ->  MinHash-LSH fuzzy dedup (verified, transitive)
                 ->  quality + language filters

Each stage is an already-tested operator (dedup.py, textops.py); this module
only sequences them, which is exactly how it scales: every stage is its own
bounded shuffle (hash-groupBy / LSH band join / map-only scoring), and the
document TEXT is only ever shuffled in the exact-dedup fingerprint pass and
the candidate-pair verify — never in the filters.

The whole composition is SQL-expressible (exact dedup = group-min, fuzzy =
exhaustive Jaccard + recursive-CTE components, filters = scalar exprs), so
the driver gate value-checks it end-to-end (__spark_entry__.corpus_prepare).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nido_spark import dedup as D
from nido_spark import textops as X


def prepare_corpus(
    docs: DataFrame,
    text_col: str = "text",
    min_quality: float = 0.4,
    langs: tuple[str, ...] = ("en",),
    jaccard_threshold: float = 0.7,
    num_perm: int = 32,
    k: int = 5,
    bands: int = 8,
    rows: int = 4,
    max_bucket_size: int | None = 50_000,
) -> DataFrame:
    """(doc_id, n_tokens, quality, lang_pred) for every document that
    survives exact dedup, fuzzy dedup, the quality floor, and the language
    allowlist. Deterministic survivor choice: smallest doc_id per duplicate
    group/cluster."""
    # each stage's output feeds multiple downstream branches, so pin the
    # stage boundaries (otherwise Catalyst re-executes the whole upstream
    # dedup per consumer — stage-boundary persistence is the standard
    # shape for multi-consumer pipelines at any scale)
    exact_survivors = D.exact_dedup(docs, text_col).persist()
    survivors = D.fuzzy_dedup(
        exact_survivors, text_col, num_perm, k, bands, rows,
        jaccard_threshold, max_bucket_size,
    ).persist()
    q = X.quality_score(survivors, text_col).select("doc_id", "n_tokens", "quality")
    lang = X.lang_id(survivors, text_col).select("doc_id", "lang_pred")
    out = (
        q.join(lang, "doc_id")
        .where((F.col("quality") >= min_quality) & F.col("lang_pred").isin(*langs))
        .select("doc_id", "n_tokens", F.round("quality", 9).alias("quality"), "lang_pred")
    )
    # materialize the (small) result, then release the stage caches — a
    # long-lived session calling this per shard must not leak corpus-sized
    # cache entries
    from nido_spark.plans import truncate_lineage

    out = truncate_lineage(out)
    exact_survivors.unpersist()
    survivors.unpersist()
    return out
