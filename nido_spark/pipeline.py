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

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nido_spark import dedup as D
from nido_spark import textops as X


# two-round affine hash over a 61-bit Mersenne prime: deterministic,
# partition- and engine-independent (plain integer arithmetic, reproducible
# in any SQL dialect — unlike xxhash/rand-based sampling). One affine step
# over CONSECUTIVE ids is a lattice (consecutive ids advance the bucket by
# a constant, so short id ranges cluster badly); the second round re-mixes
# the first round's low 30 bits, which cycle with full period (a1 odd).
# The final modulus must be SMALL relative to a2*2^30 so the product wraps
# it many thousands of times (equidistribution) — a 61-bit modulus wraps
# ~once and the output is a lattice (measured 0.39 kept at rate 0.25).
# With P2 = 2^31-1 and the MINSTD multiplier, 500 consecutive ids keep
# 0.252-0.254 at rate 0.25 and shards split within +/-2%.
# Overflow discipline (ANSI-safe for the FULL int64 id range, including
# 64-bit hash-derived ids): the id is reduced mod P up front, then A1*x
# mod P is computed by a 31/30-bit split using the Mersenne identity
# 2^61 = 1 (mod P) — every intermediate stays below 2^63 (bounds inline).
# Mathematically identical to (A1*(id+seed)+B1) mod P, which is what the
# DuckDB oracle runs verbatim in HUGEINT; a2*2^30 < 2^47 for round two.
_SAMPLE_P = (1 << 61) - 1
_SAMPLE_P2 = (1 << 31) - 1
_SAMPLE_A1 = 1_103_515_245          # < 2^31, odd
_SAMPLE_B1 = 12_345
_SAMPLE_A2 = 48_271                 # MINSTD multiplier for mod 2^31-1
_SAMPLE_B2 = 11_213


def _bucket(id_col, seed: int):
    """Two-round mix -> uniform bucket in [0, 2^31-1) over a COLUMN NAME."""
    return _bucket_col(F.col(id_col), seed)


def _bucket_col(col, seed: int):
    """Two-round mix over an arbitrary long Column expression — the single
    home of the ANSI-overflow-sensitive arithmetic (graph.neighbor_sample
    and every sampling oracle replay THIS exact math; review finding: no
    second copy may exist to drift)."""
    # x = (id mod P) + seed          < 2^61 + 2^31, non-negative
    x = F.pmod(col.cast("long"), F.lit(_SAMPLE_P)) + F.lit(seed)
    # splits use shifts, NOT `/` (double division is inexact above 2^53)
    xh = F.shiftright(x, 31)                  # < 2^30 + 1
    xl = F.pmod(x, F.lit(1 << 31))            # < 2^31
    t = F.lit(_SAMPLE_A1) * xh                # < 2^31 * (2^30+1) < 2^61
    th = F.shiftright(t, 30)                  # < 2^31
    tl = F.pmod(t, F.lit(1 << 30))            # < 2^30
    # t*2^31 = th*2^61 + tl*2^31 = th + tl*2^31 (mod P); tl*2^31 < 2^61
    hi = th + tl * F.lit(1 << 31)             # < 2^31 + 2^61 < 2^62
    # hi + A1*xl + B1 < 2^62 + 2^62 < 2^63: no ANSI overflow anywhere
    r1 = F.pmod(hi + F.lit(_SAMPLE_A1) * xl + F.lit(_SAMPLE_B1), F.lit(_SAMPLE_P))
    low = F.pmod(r1, F.lit(1 << 30))
    return F.pmod(F.lit(_SAMPLE_A2) * low + F.lit(_SAMPLE_B2), F.lit(_SAMPLE_P2))


def sample_corpus(
    docs: DataFrame, rate: float, seed: int = 42, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic ~``rate`` subsample keyed on the id: a row is kept iff
    its affine-hash bucket falls below rate*P. Reproducible across runs,
    engines and partitionings (never ``rand()``/``df.sample`` — those are
    partition-layout-dependent); the standard way to carve stable
    evaluation slices out of a 100 TB corpus. Map-only, no shuffle."""
    threshold = int(rate * _SAMPLE_P2)
    return docs.where(_bucket(id_col, seed) < threshold)


def sample_stratified(
    docs: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum subsample — the training-mix control knob
    (e.g. keep 100% of en, 25% of de, drop the rest): a row is kept iff its
    stratum has a rate and its affine-hash bucket falls below rate*P.
    Same hash family as sample_corpus, so stratified slices, uniform
    slices, and shards all compose consistently; reproducible in any
    engine.

    Rendering: a broadcast join against a tiny (stratum, threshold) literal
    table — O(1) expression size however many strata the mix has (a
    10^4-strata mix as an OR-chain predicate would be a 10^4-clause
    expression; review finding r3). The inner join drops unlisted strata,
    matching the predicate form; the broadcast keeps the plan map-side
    (no shuffle of the corpus)."""
    from pyspark.sql.types import LongType, StructField, StructType

    # threshold column name derived clash-free (docs may contain "_thr");
    # the literal table carries the strata column in the DOCS column's own
    # type, so non-string strata keys (int buckets, ...) work unchanged
    thr_col = "_thr"
    while thr_col in docs.columns:
        thr_col += "_"
    schema = StructType(
        [
            StructField(strata_col, docs.schema[strata_col].dataType),
            StructField(thr_col, LongType()),
        ]
    )
    thr_rows = [(s, int(r * _SAMPLE_P2)) for s, r in sorted(rates.items())]
    thr = docs.sparkSession.createDataFrame(thr_rows, schema)
    return (
        docs.join(F.broadcast(thr), strata_col, "inner")
        .where(_bucket(id_col, seed) < F.col(thr_col))
        .select(*docs.columns)
    )


def split_corpus(
    docs: DataFrame,
    ratios: dict[str, float] | None = None,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """docs + ``split`` — deterministic train/val/test assignment on the
    shared affine bucket hash (default 98/1/1): the [0, P2) bucket range
    is carved into consecutive half-open intervals sized by ``ratios``
    (iteration order), and a row's split is the interval its bucket
    lands in. Every row is assigned exactly once (the LAST split absorbs
    the integer-rounding remainder up to P2), splits are disjoint by
    construction, and membership is a pure function of the id — the same
    document lands in the same split on any engine, partitioning, rerun,
    or corpus SUPERSET (a doc ingested tomorrow cannot move today's docs
    across the train/eval boundary — the leakage guarantee rand()-based
    re-splitting cannot give). Composes with sample_corpus /
    sample_stratified / assign_shards under a different seed (same hash
    family, decorrelated streams). Map-only, no shuffle."""
    if ratios is None:
        ratios = {"train": 0.98, "val": 0.01, "test": 0.01}
    if not ratios:
        raise ValueError("ratios must be non-empty")
    if any(r < 0 for r in ratios.values()):
        raise ValueError("ratios must be non-negative")
    total = sum(ratios.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"ratios must sum to 1.0 (got {total})")
    names = list(ratios)
    b = _bucket(id_col, seed)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += ratios[name]
        cond = b < F.lit(int(cum * _SAMPLE_P2))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    split = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return docs.withColumn("split", split)


def assign_shards(
    docs: DataFrame, n_shards: int, seed: int = 42, id_col: str = "doc_id"
) -> DataFrame:
    """Add a deterministic ``shard`` column in [0, n_shards): the stable
    train/eval/holdout or worker-sharding assignment (same hash family as
    sample_corpus, so slices and shards compose consistently)."""
    return docs.withColumn(
        "shard", F.pmod(_bucket(id_col, seed), F.lit(n_shards)).cast("int")
    )


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


def sample_weighted(
    docs: DataFrame,
    weight_col: str,
    k: int,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement of ``k`` rows —
    the Efraimidis-Spirakis exponential race: each row draws u from its
    id's affine-hash bucket (the engine's shared portable hash, so the
    draw is reproducible across runs, engines and partitionings) and
    scores key = -ln(u) / w; the k smallest keys win, which is exactly
    weighted sampling without replacement. The quality/recency-weighted
    corpus carve-out ("sample 1M docs proportional to quality^2") that
    uniform sample_corpus can't express.

    key is rounded to 9 dp (the node2vec race convention) so the winner
    set — and hence the oracle comparison — is stable under cross-engine
    ln/double noise; ties after rounding break on the id. orderBy+limit
    compiles to TakeOrderedAndProject (bounded per-partition heap + one
    k-row merge — no global sort materialization), so the pass is one
    map-side scan at any corpus size. Rows with w <= 0 never win (they
    are filtered, the with-or-without-replacement convention)."""
    u = (_bucket(id_col, seed) + F.lit(1)) / F.lit(float(_SAMPLE_P2 + 1))
    key = F.round(-F.log(u) / F.col(weight_col), 9)
    return (
        docs.where(F.col(weight_col) > 0)
        .withColumn("_wk", key)
        .orderBy(F.col("_wk").asc(), F.col(id_col).asc())
        .limit(k)
        .drop("_wk")
    )


def sample_k_per_stratum(
    docs: DataFrame,
    k: int,
    strata_col: str = "lang",
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic BALANCED sample: exactly min(k, stratum size) rows
    per stratum, chosen by the smallest portable-hash draw (id ties) —
    the class-balanced eval-slice builder (rate-based sample_stratified
    keeps proportions; this pins ABSOLUTE per-class counts, what a
    fixed-size benchmark needs). One window partitioned BY STRATUM over
    hash ranks — no global sort, no skew beyond the stratum sizes
    themselves; reproducible across runs, engines and partitionings."""
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        _bucket(id_col, seed).asc(), F.col(id_col).asc()
    )
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def pack_documents(
    docs: DataFrame,
    budget: int,
    n_shards: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic concat-and-chunk sequence packing — the step that
    turns a filtered corpus into fixed-token-budget training shards:

        (doc_id, shard, n_tokens, pack, pack_pos)

    Documents are hash-assigned to ``n_shards`` shards (assign_shards'
    portable affine mix, so packing composes with sampling/sharding),
    laid out in ascending ``id_col`` order within the shard, and cut into
    packs of ``budget`` tokens by cumulative offset: a document whose
    first token falls at offset c joins pack ``c DIV budget`` (integer
    division — engine-exact). Packs therefore average ``budget`` tokens;
    a document longer than the remaining pack space stays WHOLE in the
    pack where it starts (the concat-then-chunk convention — the trainer
    splits at sequence boundaries downstream, this operator only fixes
    the deterministic shard layout). ``pack_pos`` is the document's
    0-based position within its pack. Token counts are whitespace tokens
    (textops.token_count semantics).

    100 TB shape: ONE hash shuffle on the shard column, then two window
    passes per shard partition (running token sum, then position within
    pack) — per-task sort bounded by the shard, never a global sort;
    pick n_shards so a shard's documents fit a task (10^4 shards at
    10^10 docs = 10^6 docs/shard). Everything is exact integer math:
    identical output on any engine, partitioning, or cluster size.

    PRECONDITION: ``id_col`` must be unique (it is the within-shard
    layout order) — duplicate ids would make the running offset
    tie-ordered and the layout partitioning-dependent."""
    from pyspark.sql import Window

    from nido_spark.textops import tokens

    if budget < 1:
        raise ValueError("pack_documents: budget must be >= 1")
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.pmod(_bucket(id_col, seed), F.lit(n_shards)).cast("int").alias("shard"),
        F.size(tokens(F.col(text_col))).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = d.withColumn(
        "_cum", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    ).withColumn("pack", F.expr(f"_cum DIV {int(budget)}"))
    wp = Window.partitionBy("shard", "pack").orderBy(F.col("doc_id").asc())
    return (
        d.withColumn("pack_pos", (F.row_number().over(wp) - F.lit(1)).cast("int"))
        .select("doc_id", "shard", "n_tokens", "pack", "pack_pos")
    )


def mixture_plan(
    docs: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    domain_col: str = "lang",
    text_col: str = "text",
) -> list[dict]:
    """Driver-side mixture plan for ``mix_corpus``: per domain, the exact
    corpus token count (whitespace tokens), the normalized target share,
    and the sampling rate rate_d = target_tokens_d / tokens_d (> 1 means
    upsampling). One aggregation over the corpus; the plan itself is
    O(#domains) and stays on the driver — the per-copy inclusion
    thresholds derived from it are exact integers, so the materialized
    mix is engine- and partitioning-exact. Raises loudly if a weighted
    domain is missing from the corpus (a silent zero would skew every
    other share)."""
    from nido_spark.textops import tokens

    if token_budget < 1:
        raise ValueError("mixture_plan: token_budget must be >= 1")
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("mixture_plan: weights must sum to > 0")
    stats = {
        r["d"]: (int(r["n_docs"]), int(r["n_tokens"]))
        for r in (
            docs.where(F.col(domain_col).isin(list(weights)))
            .groupBy(F.col(domain_col).alias("d"))
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum(F.size(tokens(F.col(text_col)))).alias("n_tokens"),
            )
            .collect()
        )
    }
    plan = []
    for d in sorted(weights):
        if weights[d] <= 0:
            continue
        if d not in stats or stats[d][1] == 0:
            raise ValueError(
                f"mixture_plan: domain {d!r} has weight {weights[d]} but no "
                f"tokens in the corpus — drop it from the mix explicitly"
            )
        n_docs, n_tokens = stats[d]
        wn = float(weights[d]) / wsum
        target = float(token_budget) * wn
        rate = target / float(n_tokens)
        plan.append(
            {
                "domain": d,
                "n_docs": n_docs,
                "n_tokens": n_tokens,
                "weight_norm": wn,
                "target_tokens": target,
                "rate": rate,
            }
        )
    return plan


def mix_corpus(
    docs: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    domain_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """(doc_id, domain, copy, n_tokens) — the deterministic epoch mix: each
    domain is up-/down-sampled toward ``token_budget * w_d / sum(w)``
    tokens (the LLaMA/Pile-style domain reweighting step). A document in
    a domain with rate r contributes floor(r) whole copies (copy =
    0..floor(r)-1) plus one fractional copy kept with probability
    r - floor(r) — decided by one extra affine round over the document's
    portable hash, so copy decisions are independent per copy index yet
    exactly reproducible on any engine or partitioning (the sampling
    thresholds are integers computed ONCE on the driver from exact token
    counts, then broadcast as a literal (domain, copy, threshold) table).

    In expectation each domain lands on its token target; there is no
    cross-document coordination, so the mix is one broadcast join + one
    bounded explode (ceil(max rate) rows per doc), map-only after the
    single plan aggregation — no shuffle of the corpus at any scale.
    Domains without weight (or weight 0) are dropped."""
    plan = mixture_plan(docs, weights, token_budget, domain_col, text_col)
    spark = docs.sparkSession
    rows = []
    for p in plan:
        n_copies = int(math.ceil(p["rate"]))
        for i in range(max(1, n_copies)):
            frac = max(0.0, min(1.0, p["rate"] - i))
            rows.append((p["domain"], i, int(frac * _SAMPLE_P2)))
    thr = spark.createDataFrame(rows, "domain string, copy int, thr long")
    from nido_spark.textops import tokens as _toks

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(domain_col).alias("domain"),
        F.size(_toks(F.col(text_col))).alias("n_tokens"),
        _bucket(id_col, seed).alias("_u"),
    )
    # one extra affine round decorrelates copy indices: u_i = (A2*(u+i)+B2) mod P2
    u_i = (
        F.lit(_SAMPLE_A2) * (F.col("_u") + F.col("copy")) + F.lit(_SAMPLE_B2)
    ) % F.lit(_SAMPLE_P2)
    return (
        base.join(F.broadcast(thr), "domain")
        .where(u_i < F.col("thr"))
        .select("doc_id", "domain", "copy", "n_tokens")
    )


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    alpha: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_tokens, logw) — per-document log importance weight for
    Data Selection via Importance Resampling (DSIR, Xie et al., NeurIPS
    2023): logw(x) = SUM_t c_t(x) * (ln p_target(t) - ln p_raw(t)) under
    add-alpha-smoothed unigram LMs fit on the raw corpus (``docs``) and
    the in-domain exemplar slice (``target``), both over their UNION
    vocab (strictly positive, both directions finite — the unigram_kl
    smoothing convention, same lowercased whitespace tokenizer).
    Zero-token documents keep logw = 0 (the empty product), n_tokens 0.

    The paper hashes n-grams into a fixed bucket space; at these vocab
    sizes the exact token identity is strictly better and stays
    oracle-replayable — swap the token column for a hash bucket when V
    itself is web-scale.

    100 TB shape: two explode+groupBy token counts (map-side combined),
    ONE full-outer join on the token for the log-ratio table, totals as
    two driver scalars (house rule), then the per-doc pass: token
    occurrences pre-reduced per (doc, token) BEFORE the ratio join (the
    bigram_logloss discipline — repeated tokens never shuffle twice) and
    one grouped sum. Text never shuffles; only (doc_id, token, m)."""
    from nido_spark.textops import tokens as _toks

    def _counts(d: DataFrame, name: str) -> DataFrame:
        return (
            d.select(F.explode(_toks(F.lower(F.col(text_col)))).alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias(name))
        )

    from nido_spark.plans import truncate_lineage

    # vocabj feeds BOTH the scalar totals (.first below) and the log-ratio
    # join — materialize it once (house stage-boundary rule, VERDICT r5
    # nit 1) so the two corpus tokenize+count aggregations run once, not
    # once per consumer
    vocabj = truncate_lineage(
        _counts(docs, "cr")
        .join(_counts(target, "ct"), "token", "full_outer")
        .select(
            "token",
            F.coalesce("cr", F.lit(0)).alias("cr"),
            F.coalesce("ct", F.lit(0)).alias("ct"),
        )
    )
    tot = vocabj.agg(
        F.count(F.lit(1)).alias("v"),
        F.sum("cr").alias("nr"),
        F.sum("ct").alias("nt"),
    ).first()
    v = int(tot["v"] or 0)
    if v == 0:
        return docs.select(
            F.col(id_col).alias("doc_id"),
            F.lit(0).cast("long").alias("n_tokens"),
            F.lit(0.0).alias("logw"),
        )
    nr, nt, al = float(tot["nr"] or 0), float(tot["nt"] or 0), float(alpha)
    lr = vocabj.select(
        "token",
        (
            F.log((F.col("ct") + F.lit(al)) / F.lit(nt + al * v))
            - F.log((F.col("cr") + F.lit(al)) / F.lit(nr + al * v))
        ).alias("lr"),
    )
    occ = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(_toks(F.lower(F.col(text_col)))).alias("token"),
        )
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    scored = occ.join(lr, "token").groupBy("doc_id").agg(
        F.sum("m").alias("n_tokens"),
        F.sum(F.col("m") * F.col("lr")).alias("logw"),
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("logw", F.lit(0.0)).alias("logw"),
        )
    )


def dsir_sample(
    docs: DataFrame,
    target: DataFrame,
    k: int,
    seed: int = 42,
    alpha: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_tokens, logw) of the ``k`` DSIR winners — importance
    resampling with probability proportional to exp(logw), rendered as
    deterministic Gumbel top-k ENTIRELY in log space: each doc draws u
    from its id's shared affine bucket and scores

        gk = logw - ln(-ln(u))        (the Gumbel-max trick)

    whose top-k is exactly Efraimidis-Spirakis weighted sampling without
    replacement with w = exp(logw) — but immune to exp overflow/underflow
    at the extreme weights long documents produce. The race reads the
    ROUND-9 logw (not the raw double: logw is a float sum whose
    association order differs per engine; the rounded value is the
    cross-engine contract) and gk itself rounds to 9 dp (the race
    convention); ties break on doc_id. orderBy+limit compiles to
    TakeOrderedAndProject (bounded heaps, no global sort)."""
    w = dsir_weights(docs, target, text_col=text_col, alpha=alpha, id_col=id_col)
    u = (_bucket("doc_id", seed) + F.lit(1)) / F.lit(float(_SAMPLE_P2 + 1))
    gk = F.round(F.round(F.col("logw"), 9) - F.log(-F.log(u)), 9)
    return (
        w.withColumn("_gk", gk)
        .orderBy(F.col("_gk").desc(), F.col("doc_id").asc())
        .limit(k)
        .drop("_gk")
    )
