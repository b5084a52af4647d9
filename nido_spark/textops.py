"""Text-analysis operators for training-data pipelines over the
``documents(doc_id, text, lang, source, n_chars)`` table.

All operators are pure Catalyst expressions (JVM-side, codegen'd — no Python
in the hot path) and each has an exactly-equivalent DuckDB SQL rendering in
__spark_entry__.oracle_sql(), which pins cross-engine semantics down to
tokenizer quirks (empty string -> 0 tokens, regex classes, md5 of trimmed
lowered text).

At 100 TB these are embarrassingly parallel map-only plans: no shuffle at
all until the caller aggregates; column pruning pushes just (doc_id, text)
into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small deterministic stopword list (shared verbatim with the SQL oracle)
STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be", "this",
]

# marker words for the n-gram-free language-ID heuristic (deterministic,
# SQL-mirrorable; a production system would use fastText — not in the image)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "la", "los", "que", "es"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokens; empty/blank text -> empty array.

    Trims ALL leading/trailing whitespace via regex before splitting —
    plain trim() strips spaces only, and a trailing \\n/\\t makes Spark's
    split (drops trailing empties) and DuckDB's regexp_split_to_array
    (keeps them) disagree on the token count. Regex-trim on both sides
    removes the divergence class entirely."""
    t = F.regexp_replace(col, r"^\s+|\s+$", "")
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens) — whitespace tokenization."""
    return docs.select("doc_id", F.size(tokens(F.col(text_col))).alias("n_tokens"))


# BPE-ish lexer classes: a run of letters ~ one (merged) word token, each
# digit its own token (GPT-2 convention), every other non-space symbol its
# own token. Class-based pattern only — identical semantics under Java regex
# (Spark) and RE2 (DuckDB), so the count is oracle-checkable.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def token_count_bpe(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens_bpe) — subword-budget estimate via the BPE-ish
    lexer above; the cheap map-only proxy for tokenizer budget accounting
    when the real BPE vocab isn't shipped to the cluster."""
    return docs.select(
        "doc_id",
        F.regexp_count(F.col(text_col), F.lit(BPE_TOKEN_RE)).alias("n_tokens_bpe"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars_obs, n_tokens, punct_ratio, stopword_ratio, quality)

    quality = heuristic in [0,1]: length band x low punctuation x healthy
    stopword fraction (the classic Gopher/C4-style cheap filters).
    """
    t = F.col(text_col)
    toks = tokens(t)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    punct = F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", ""))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, F.lower(x))))
    stopword_ratio = n_stop / F.greatest(n_tokens, F.lit(1))
    quality = (
        F.when((n_tokens >= 5) & (n_tokens <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
        * (F.lit(1.0) - F.least(punct_ratio * 2, F.lit(1.0)))
        * F.least(stopword_ratio * 4 + F.lit(0.2), F.lit(1.0))
    )
    from nido_spark.plans import spread_small_input

    docs = spread_small_input(docs)  # regex + token scans are the heavy
    # map work — parallelize a single-file input (no-op at scale)
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars_obs"),
        n_tokens.alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        stopword_ratio.alias("stopword_ratio"),
        quality.alias("quality"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fp) — canonical content fingerprint md5(lower(trim(text)))."""
    return docs.select(
        "doc_id", F.md5(F.lower(F.trim(F.col(text_col)))).alias("fp")
    )


# winnowing parameters: polynomial rolling-hash base/modulus. Pure integer
# arithmetic (Horner with interleaved mod) so any engine reproduces the
# exact fingerprints; values stay < 2^40 (ANSI-safe).
WINNOW_B = 257
WINNOW_P = (1 << 31) - 1


def winnow_fingerprint_positions(
    docs: DataFrame, k: int = 5, window: int = 4, text_col: str = "text"
) -> DataFrame:
    """(doc_id, p, g, fp) — positional winnowed fingerprints: ``fp`` is
    the minimum k-gram rolling hash over the ``window`` consecutive grams
    starting at 0-based gram position ``p`` of lower(trim(text)); the
    window covers characters [p, p + k + window - 1). ``g`` is the gram
    position of the selected min (ties -> smallest): the winnow
    OCCURRENCE key — consecutive windows re-selecting one gram share a
    single (doc_id, g), which is what lets within-doc repetition be
    counted without conflating it with adjacent-window re-selection. The
    positional form feeds span-level dedup (dup_spans);
    winnow_fingerprints is its position-free distinct projection.

    Rendering: Arrow-batched ``mapInPandas`` — per doc, the gram-hash
    vector is k vectorized int64 ops over the codepoint array and the
    windowed min is a ``sliding_window_view`` reduction; rows out are
    slim (doc_id, p, fp) triples. Embarrassingly parallel, NO shuffle
    (the text never leaves its scan task), identical integer math to the
    SQL oracle. This is the one textops operator where the pure-Catalyst
    renderings measurably lose: an explode-then-hash plan drags a full
    copy of the document through every gram row and re-evaluates k
    substrings per row (42 s for the sf0.1 span pipeline at k=20), a
    transform-then-explode plan re-inlines lower(trim(text)) into every
    lambda element after projection collapse (76 s), and a fully nested
    array rendering is O(grams x window x k) (measured 75x slower at
    k=5); the NumPy kernel runs the same pipeline in a few seconds.
    Non-ASCII note: lowering happens in Python (str.lower) — identical
    to JVM lower() for ASCII/Latin; exotic case-mapping codepoints could
    differ, same caveat the SQL oracle already carries.
    Docs shorter than k+window-1 chars produce no fingerprints."""
    b, p_mod = WINNOW_B, WINNOW_P

    def gen(batches):
        import numpy as np
        import pandas as pd
        from numpy.lib.stride_tricks import sliding_window_view

        for pdf in batches:
            ids_out, ps_out, gs_out, fps_out = [], [], [], []
            for doc_id, txt in zip(pdf["doc_id"], pdf[text_col]):
                if txt is None:
                    continue
                t = txt.strip(" ").lower()  # = lower(trim(x)): trim is space-only
                m = len(t) - k + 1
                if m < window:
                    continue
                codes = np.frombuffer(
                    t.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                h = codes[:m].copy()
                # Horner with interleaved mod: values stay < 2^40, exact
                for i in range(1, k):
                    h = (h * b + codes[i : i + m]) % p_mod
                sw = sliding_window_view(h, window)
                wm = sw.min(axis=1)
                # gram position of the selected (min) hash; ties take the
                # smallest position (np.argmin first-match) — the winnow
                # occurrence key: two window positions selecting the same
                # gram are ONE occurrence of the underlying substring
                gs = sw.argmin(axis=1).astype(np.int32)
                gs += np.arange(len(wm), dtype=np.int32)
                # np.repeat keeps the id's own dtype (string/long/... ids
                # all pass through, like the Catalyst rendering did)
                ids_out.append(np.repeat(doc_id, len(wm)))
                ps_out.append(np.arange(len(wm), dtype=np.int32))
                gs_out.append(gs)
                fps_out.append(wm)
            if ids_out:
                yield pd.DataFrame(
                    {
                        "doc_id": np.concatenate(ids_out),
                        "p": np.concatenate(ps_out),
                        "g": np.concatenate(gs_out),
                        "fp": np.concatenate(fps_out),
                    }
                )

    from nido_spark.plans import spread_small_input

    id_type = docs.schema["doc_id"].dataType.simpleString()
    # the Arrow kernel is embarrassingly parallel but bound to its input
    # partitioning — spread a single-file scan across the cores first
    # (no-op at scale; round 6: one Arrow worker vs 32)
    return spread_small_input(docs.select("doc_id", text_col)).mapInPandas(
        gen, schema=f"doc_id {id_type}, p int, g int, fp long"
    )


def winnow_fingerprints(
    docs: DataFrame, k: int = 5, window: int = 4, text_col: str = "text"
) -> DataFrame:
    """(doc_id, fp) — winnowed k-gram rolling-hash fingerprints (Schleimer,
    Wilkerson & Aiken, "Winnowing: local algorithms for document
    fingerprinting", SIGMOD 2003 — the MOSS scheme): hash every character
    k-gram with a polynomial rolling hash, then keep the minimum hash of
    every ``window`` consecutive k-grams. Guarantees: any shared substring
    of length >= k+window-1 yields a shared fingerprint, and the selected
    set is ~2/(window+1) of all grams — the sub-linear sketch used for
    plagiarism/overlap detection at corpus scale. See
    winnow_fingerprint_positions for the plan shape."""
    return (
        winnow_fingerprint_positions(docs, k, window, text_col)
        .select("doc_id", "fp")
        .distinct()
    )


def dup_spans(
    docs: DataFrame,
    k: int = 5,
    window: int = 4,
    min_len: int = 50,
    gap: int | None = None,
    text_col: str = "text",
    within_doc: bool = False,
    persist_positions: bool = True,
) -> DataFrame:
    """(doc_id, span_start, span_end, n_hits) — character spans of
    lower(trim(text)) duplicated ACROSS documents, the span-level substring
    dedup of Lee et al. 2022 ("Deduplicating Training Data Makes Language
    Models Better") rendered over winnowed fingerprints instead of a suffix
    array: a fingerprint selected in two different documents witnesses a
    shared substring of >= k chars, and inside any shared region of length
    >= k+window-1 winnowing selects at least one fingerprint per ``window``
    gram positions in BOTH documents (selection is a function of window
    content alone). Matched positions therefore tile a duplicated region
    with gaps <= window; grouping positions whose successive gap is <=
    ``gap`` (default k+window, one window plus gram width of slop for
    region edges) into islands yields maximal duplicated runs. Span =
    [min_p, max_p + k + window - 1) in char offsets; islands shorter than
    ``min_len`` chars are dropped.

    100 TB shape: the only wide exchanges move (doc_id, p, fp) triples —
    two longs and an int, never text; the shared-fp filter is a groupBy on
    the ~2/(window+1)-dense fingerprint stream + one semi join; island
    detection is a per-doc window (each partition is one doc's hit list,
    bounded by doc length / window). Pair-explosion is impossible by
    construction — a fingerprint shared by 10^6 docs contributes one
    *group row*, not 10^12 pairs.

    ``within_doc=True`` additionally flags substrings a document repeats
    INSIDE itself (the full Lee-et-al ExactSubstr scope): duplication is
    then counted over distinct winnow OCCURRENCES (doc_id, selected-gram
    position) rather than distinct documents — consecutive windows
    re-selecting the same gram are one occurrence, so a single copy of a
    substring never self-triggers. Both copies of a repeat are flagged
    (remove_spans scrubs every flagged span — the aggressive policy;
    keep-one-copy requires ranking occurrences, which the (doc_id, g)
    key supports if needed).

    Spans index into the NORMALIZED text (lower+trim) — feed the same
    normalization to remove_spans, which re-derives it identically."""
    from pyspark.sql import Window

    if gap is None:
        gap = k + window
    pos = winnow_fingerprint_positions(docs, k, window, text_col)
    # the positions feed TWO plan branches (the shared-fp aggregation and
    # the hit probe); without a persist each action runs the Arrow kernel
    # twice over all text. The cached triples are slim (~2 ints + 2 longs
    # per char/(window+1)). With persist_positions=True the operator is
    # EAGER: the span result (slim rows) is materialized before returning
    # and the positions cache is RELEASED — repeated calls in a long-lived
    # session no longer accumulate cached position tables (ADVICE r4).
    # Pass persist_positions=False to keep the plan fully lazy (e.g.
    # composing into a larger cached stage that already materializes
    # positions — that stage then owns the double-evaluation tradeoff).
    if persist_positions:
        pos = pos.persist()
    occ_key = ["doc_id", "g"] if within_doc else ["doc_id"]
    shared = (
        pos.select(*occ_key, "fp")
        .distinct()
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("nd"))
        .where(F.col("nd") >= 2)
        .select("fp")
    )
    hits = pos.join(shared, "fp", "left_semi").select("doc_id", "p").distinct()
    # gaps-and-islands in two window passes (window calls cannot nest):
    # both run in the SAME doc_id sort — one shuffle, one partition sort.
    w = Window.partitionBy("doc_id").orderBy("p")
    flagged = hits.withColumn(
        "new_run",
        F.when(F.col("p") - F.lag("p").over(w) > gap, 1).otherwise(0),
    )
    isl = flagged.withColumn(
        "g",
        F.sum("new_run").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    out = (
        isl.groupBy("doc_id", "g")
        .agg(
            F.min("p").cast("long").alias("span_start"),
            (F.max("p") + F.lit(k + window - 1)).cast("long").alias("span_end"),
            F.count(F.lit(1)).alias("n_hits"),
        )
        .where(F.col("span_end") - F.col("span_start") >= min_len)
        .select("doc_id", "span_start", "span_end", "n_hits")
    )
    if persist_positions:
        from nido_spark.plans import truncate_lineage

        # materialize the slim span rows, then release the positions cache
        # (the one action consuming both branches) — no leak per call
        out = truncate_lineage(out)
        pos.unpersist()
    return out


def remove_spans(
    docs: DataFrame, spans: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(doc_id, clean_text) — rewrite each document with its ``spans``
    (doc_id, span_start, span_end char ranges over lower(trim(text)), as
    produced by dup_spans) excised; docs without spans pass through with
    the same normalization. Overlapping/adjacent spans are handled by the
    running-cursor fold (the cursor never moves backwards).

    Plan: spans collapse to ONE sorted array per doc (bounded by
    doc_len/min_len entries — collect_list here is per-doc, not per-key
    skew), one left join, then a pure-Catalyst fold (F.aggregate) builds
    the kept text. Map-only after the join; no Python."""
    sp = spans.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_list(F.struct("span_start", "span_end"))
        ).alias("_spans")
    )
    t = F.lower(F.trim(F.col(text_col)))
    folded = F.aggregate(
        F.col("_spans"),
        F.struct(F.lit(0).cast("long").alias("pos"), F.lit("").alias("acc")),
        lambda a, s: F.struct(
            F.greatest(a["pos"], s["span_end"]).alias("pos"),
            F.concat(
                a["acc"],
                F.when(
                    s["span_start"] > a["pos"],
                    F.substring(t, a["pos"] + 1, s["span_start"] - a["pos"]),
                ).otherwise(F.lit("")),
            ).alias("acc"),
        ),
        lambda a: F.concat(
            a["acc"], F.substring(t, a["pos"] + 1, F.length(t) - a["pos"])
        ),
    )
    return docs.join(sp, "doc_id", "left").select(
        "doc_id",
        F.when(F.col("_spans").isNull(), t).otherwise(folded).alias("clean_text"),
    )


def line_dedup(
    docs: DataFrame, text_col: str = "text", min_line_len: int = 1
) -> DataFrame:
    """(doc_id, clean_text) — corpus-wide LINE-level deduplication, the
    C4-style "remove repeated lines across documents" cleanup (Raffel
    et al. 2020 dedup at the three-sentence-span/line granularity): every
    exact duplicate line keeps exactly ONE canonical occurrence — the
    globally smallest (doc_id, line_idx) — and every other occurrence is
    dropped; unique lines and lines shorter than ``min_line_len`` chars
    (blank separators by default) pass through untouched. Documents
    reassemble in original line order.

    100 TB shape: line text is hashed map-side to a 128-bit key (two
    independent xxhash64 salts), so the dedup groupBy moves only
    (h1, h2, doc_id, idx) tuples — never line text; the keep-set joins
    back as a slim per-doc sorted index array, and the rewrite re-splits
    the original text in its own scan task (text never crosses an
    exchange, same discipline as dup_spans). Collision odds at 10^12
    lines over 128 bits: ~1e-14 — below any at-rest storage error rate.

    Trailing-empty-line semantics: the split keeps trailing empties
    (limit=-1) so rewritten docs preserve exact byte layout for
    untouched lines (and the DuckDB oracle agrees line-for-line)."""
    lines = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), "\n", -1)).alias("idx", "line"),
    )
    dd = lines.where(F.length("line") >= min_line_len).select(
        "doc_id",
        "idx",
        F.xxhash64("line").alias("h1"),
        F.xxhash64(F.lit(0x9E3779B9), F.col("line")).alias("h2"),
    )
    first = dd.groupBy("h1", "h2").agg(
        F.min(F.struct("doc_id", "idx")).alias("keep"),
        F.count(F.lit(1)).alias("cnt"),
    )
    drop = (
        dd.join(first, ["h1", "h2"])
        .where(
            (F.col("cnt") > 1)
            & ~(
                (F.col("doc_id") == F.col("keep.doc_id"))
                & (F.col("idx") == F.col("keep.idx"))
            )
        )
        .select("doc_id", "idx")
    )
    drop_arr = drop.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("idx")).alias("_drop")
    )
    parts = F.split(F.col(text_col), "\n", -1)
    kept = F.filter(
        F.transform(parts, lambda x, i: F.struct(x.alias("l"), i.alias("i"))),
        lambda s: ~F.array_contains(F.coalesce(F.col("_drop"), F.array()), s["i"]),
    )
    return docs.join(drop_arr, "doc_id", "left").select(
        "doc_id",
        F.array_join(F.transform(kept, lambda s: s["l"]), "\n").alias("clean_text"),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred, lang_score) — marker-word voting over
    {en,de,fr,es}; 'und' (undetermined) when no marker hits. Deterministic
    tie-break by language code order via greatest-of-structs."""
    from nido_spark.plans import spread_small_input

    docs = spread_small_input(docs)  # 4 token-array scans per row —
    # parallelize a single-file input (no-op at scale)
    toks = tokens(F.col(text_col))
    scores = []
    for code in sorted(LANG_MARKERS):
        marks = F.array(*[F.lit(m) for m in LANG_MARKERS[code]])
        n = F.size(F.filter(toks, lambda x: F.array_contains(marks, F.lower(x))))
        # negated-score structs: array_min picks (max score, tie -> min
        # code) in ONE lexicographic comparison — identical semantics to
        # the old when-chain ("strictly greater replaces", so the first =
        # smallest code wins ties), but each score is evaluated once
        # instead of being re-inlined at every chain level (round 6: the
        # nested whens re-evaluated the marker filters up to 8x per row)
        scores.append(F.struct((-n).alias("ns"), F.lit(code).alias("c")))
    best = F.array_min(F.array(*scores))
    # two-step select: `best` is referenced three times below; its own
    # projection keeps Catalyst from inlining the array of filters thrice
    return docs.select("doc_id", best.alias("_best")).select(
        "doc_id",
        F.when(-F.col("_best.ns") > 0, F.col("_best.c"))
        .otherwise(F.lit("und"))
        .alias("lang_pred"),
        (-F.col("_best.ns")).cast("long").alias("lang_score"),
    )


def ngram_profile(docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """(doc_id, ngram, cnt) — exploded character n-gram counts; the building
    block for n-gram Jaccard similarity and corpus-level language profiles."""
    t = F.lower(F.trim(F.col(text_col)))
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.length(t) - n, F.lit(0))),
        lambda i: t.substr(i + 1, F.lit(n)),
    )
    return (
        docs.select("doc_id", F.explode(grams).alias("ngram"))
        .where(F.length("ngram") == n)
        .groupBy("doc_id", "ngram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _word_ngrams(docs: DataFrame, n: int, text_col: str, id_alias: str) -> DataFrame:
    """(id_alias, g) — every word-level n-gram of the lowercased whitespace
    tokenization, as a space-joined string. One explode; grams of a doc stay
    in the producing task until the consumer shuffles/joins them."""
    toks = tokens(F.lower(F.col(text_col)))
    return (
        docs.select(F.col("doc_id").alias(id_alias), toks.alias("t"))
        .where(F.size("t") >= n)
        .select(
            id_alias,
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("t") - n),
                    lambda i: F.array_join(F.slice("t", i + F.lit(1), n), " "),
                )
            ).alias("g"),
        )
    )


def ngram_decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 13,
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: doc_ids of training documents sharing ANY
    word-level ``n``-gram with ``eval_docs`` (the standard 13-gram rule for
    scrubbing evaluation contamination out of a pre-training corpus).

    Plan shape (100 TB): both sides reduce to DISTINCT n-gram hash sets —
    64-bit xxhash64 through every exchange, never the gram strings; the
    eval side is tiny in practice (benchmarks) so AQE broadcasts it, and
    the contaminated-id set is produced by ONE semi join. The oracle SQL
    joins raw gram strings; xxhash64 is collision-free here in the
    deterministic-fixture sense (a collision would be a value diff the
    driver gate catches)."""
    train_g = _word_ngrams(docs, n, text_col, "doc_id").select(
        "doc_id", F.xxhash64("g").alias("h")
    )
    eval_g = (
        _word_ngrams(eval_docs, n, text_col, "eval_id")
        .select(F.xxhash64("g").alias("h"))
        .distinct()
    )
    return (
        train_g.join(eval_g, "h", "left_semi")
        .select("doc_id")
        .distinct()
    )


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_lines, dup_line_frac, top_bigram_frac) — the Gopher-style
    repetition quality signals (Rae et al. 2021, "Scaling Language Models",
    table A1): documents dominated by duplicate lines or by one repeated
    2-gram are boilerplate/spam and get filtered before training.

    - dup_line_frac: (n_lines - distinct_lines) / n_lines, computed ENTIRELY
      map-side with array_distinct on the split lines — no shuffle, no
      explode; blank-only lines are dropped first (trailing-newline parity
      with the SQL oracle).
    - top_bigram_frac: occurrences of the most frequent token 2-gram over
      total 2-grams; one explode + per-doc aggregation (map-side
      combinable; grouped by doc_id so a hot doc cannot skew a key — the
      group IS the doc).
    Docs with no lines get 0.0 fractions; docs with < 2 tokens get
    top_bigram_frac 0.0."""
    lines = F.filter(
        F.split(F.col(text_col), "\n"),
        lambda s: F.regexp_replace(s, r"^\s+|\s+$", "") != "",
    )
    base = docs.select(
        "doc_id",
        F.size(lines).alias("n_lines"),
        F.when(F.size(lines) > 0,
               (F.size(lines) - F.size(F.array_distinct(lines)))
               / F.size(lines))
        .otherwise(F.lit(0.0)).alias("dup_line_frac"),
    )
    bi = _word_ngrams(docs, 2, text_col, "doc_id")
    top = (
        bi.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg((F.max("c") / F.sum("c")).alias("top_bigram_frac"))
    )
    return base.join(top, "doc_id", "left").select(
        "doc_id", "n_lines",
        F.col("dup_line_frac").cast("double").alias("dup_line_frac"),
        F.coalesce(F.col("top_bigram_frac").cast("double"), F.lit(0.0)).alias(
            "top_bigram_frac"
        ),
    )


# PII patterns applied IN ORDER (order matters where matches could overlap
# — both engines replace sequentially, so results agree by construction).
# Class-based regexes only: identical semantics under Java regex (Spark)
# and RE2 (DuckDB), including \b word boundaries.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
    ("phone", r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
]


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_email, n_ssn, n_phone, n_ipv4, clean_text) — PII scrub,
    the redaction pass a training corpus gets before tokenization: emails,
    US-SSN-shaped ids, phone numbers, and IPv4 literals are counted (on
    the ORIGINAL text, per pattern) and replaced with <TYPE> tokens,
    sequentially in PII_PATTERNS order. Pure Catalyst regexp_count /
    regexp_replace — map-only, no shuffle, codegen'd; the DuckDB oracle
    replays the same patterns in the same order (with the 'g' flag —
    DuckDB replaces first-match-only by default)."""
    c = F.col(text_col)
    counts = [
        F.regexp_count(c, F.lit(pat)).alias(f"n_{name}")
        for name, pat in PII_PATTERNS
    ]
    clean = c
    for name, pat in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, f"<{name.upper()}>")
    return docs.select("doc_id", *counts, clean.alias("clean_text"))


def bm25_scores(
    docs: DataFrame,
    query_terms,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, score, n_hit) — Okapi BM25 relevance of every document
    against a bag of query terms (lowercased whitespace tokens, the
    engine's shared tokenizer): score = sum over matched terms of
    idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl)), with the
    Lucene idf = ln(1 + (N - df + 0.5)/(df + 0.5)) (always positive).
    Docs matching no term score 0 with n_hit 0 — the corpus-ranking
    primitive for retrieval-based decontamination and quality filtering.

    Scale shape (plan-audited): ONE tokenize+explode scan feeding ONE
    groupBy(doc_id) that computes the doc length AND every per-term tf
    as |q| conditional sums — no per-term shuffle, no second pass over
    the text. The term document frequencies reduce that V-row table to
    |q| scalars in one cheap action, so the idf factors enter the score
    as LITERALS and the scoring itself is map-side (zero additional
    exchanges). The naive rendering (explode -> per-(doc, term) groupBy
    -> df groupBy -> three-way join) measured 22 exchanges with the
    tokenize scan re-run per branch; this one runs 2 (the doc aggregation
    + the final left join back to the full doc list). All float inputs
    (tf, df, dl, N, total token count) are exact integers, so the oracle
    reproduces scores to <= |q|-term sum order."""
    terms = sorted({str(t).lower() for t in query_terms})
    if not terms:
        raise ValueError("bm25_scores needs a non-empty query term list")
    toks = docs.select(
        "doc_id", F.explode(tokens(F.lower(F.col(text_col)))).alias("token")
    )
    per_doc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum(F.when(F.col("token") == t, 1).otherwise(0)).alias(f"_tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    from nido_spark.plans import truncate_lineage

    per_doc = truncate_lineage(per_doc)
    n_docs = docs.count()
    stats = per_doc.agg(
        F.sum("dl").alias("tt"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    ).first()
    avgdl = float(stats["tt"] or 0) / n_docs if n_docs else 1.0
    score = F.lit(0.0)
    n_hit = F.lit(0)
    for i in range(len(terms)):
        df = int(stats[f"_df{i}"] or 0)
        import math

        idf = math.log(1.0 + (float(n_docs) - df + 0.5) / (df + 0.5))
        tf = F.col(f"_tf{i}")
        denom = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl)
        )
        score = score + F.when(
            tf > 0, F.lit(idf) * tf * F.lit(k1 + 1.0) / denom
        ).otherwise(F.lit(0.0))
        n_hit = n_hit + F.when(tf > 0, 1).otherwise(0)
    agg = per_doc.select("doc_id", score.alias("score"), n_hit.alias("n_hit"))
    return docs.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("score", F.lit(0.0)).alias("score"),
        F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
    )


def vocab_top_k(
    docs: DataFrame, n: int = 1000, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """(token, cnt, rank) — corpus-level vocabulary: lowercased whitespace
    tokens, global counts, top ``n`` by (cnt desc, token asc) — the
    deterministic tie order that makes the table reproducible across
    engines/partitionings. The tokenizer-training prep step (seed vocab /
    frequency table) of a corpus pipeline.

    100 TB shape: explode + one map-side-combined groupBy on the token;
    the final top-n is a GUARANTEED TakeOrderedAndProject (orderBy+limit —
    not a rank<=n filter over an empty-partition window, whose single-
    partition-sort avoidance depends on the InferWindowGroupLimit
    optimizer rule firing); rank is then assigned over the n surviving
    rows only. min_count prunes the hapax tail before the take."""
    from pyspark.sql import Window

    toks = tokens(F.lower(F.col(text_col)))
    counts = (
        docs.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= min_count)
    )
    top = counts.orderBy(F.col("cnt").desc(), F.col("token").asc()).limit(n)
    w = Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "token", "cnt", "rank"
    )


def unigram_logloss(
    docs: DataFrame, text_col: str = "text", k: float = 0.5
) -> DataFrame:
    """(doc_id, n_tokens, xent_bits) — per-document cross-entropy in
    bits/token under the corpus's OWN add-k-smoothed unigram language
    model: p(t) = (c_t + k) / (N + k*V) over corpus token counts (N
    total tokens, V distinct). The classic cheap LM-quality signal
    (CCNet-style perplexity bucketing, Wenzek et al. 2020) with no
    external model — repetitive/boilerplate docs score LOW bits/token,
    lexically odd docs score HIGH; filter both tails. perplexity =
    2^xent_bits. Documents with zero tokens are dropped (entropy
    undefined). Tokens are the shared whitespace ``tokens()`` (same
    counts as token_count, oracle-replayable).

    100 TB shape: one explode + map-side-combined token count (the
    vocab_top_k scan), two scalar reductions (N, V — driver scalars by
    the house rule), then token-keyed join back and a per-doc grouped
    sum. Both shuffles key on token/doc_id with partial aggregation;
    hot tokens ('the') are single spillable reduce keys at the count
    and broadcast-or-AQE-handled at the join."""
    toks = docs.select(
        "doc_id", F.explode(tokens(F.col(text_col))).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = counts.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("v")
    ).first()
    n_corpus, vocab = int(tot["n"] or 0), int(tot["v"] or 0)
    if n_corpus == 0:
        return docs.select(
            "doc_id",
            F.lit(0).cast("long").alias("n_tokens"),
            F.lit(None).cast("double").alias("xent_bits"),
        ).limit(0)
    denom = float(n_corpus) + k * float(vocab)
    scored = toks.join(counts, "tok").select(
        "doc_id",
        F.log2((F.col("c").cast("double") + F.lit(k)) / F.lit(denom)).alias(
            "lp"
        ),
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (-F.sum("lp") / F.count(F.lit(1))).alias("xent_bits"),
    )


def bigram_logloss(
    docs: DataFrame, text_col: str = "text", k: float = 0.5
) -> DataFrame:
    """(doc_id, n_bigrams, xent_bits) — per-document cross-entropy in
    bits/bigram under the corpus's OWN add-k-smoothed bigram language
    model: p(w2|w1) = (c(w1 w2) + k) / (c(w1) + k*V), with c(.) corpus
    counts and V the distinct-unigram vocabulary. The order-sensitive
    upgrade of ``unigram_logloss``: a doc built from common words in
    unusual ORDER (shuffled boilerplate, keyword stuffing, MT garbage)
    scores high here while the unigram signal misses it; the
    unigram/bigram xent GAP is the classic fluency feature. Documents
    with fewer than two tokens are dropped (no bigrams). Same
    whitespace ``tokens()`` rendering as token_count, so the model is
    oracle-replayable token for token.

    100 TB shape: one explode produces (doc, w1, w2) occurrence triples
    which are immediately pre-reduced per (doc, w1, w2) — repeated
    phrases inside a doc collapse map-side before anything shuffles.
    Corpus bigram counts are a second groupBy of the SAME pre-reduced
    table (no second scan of the text), the context denominator joins
    the unigram count table on w1, and V is the one driver scalar (the
    house rule). Hot contexts ('the', '-') are single reduce keys at
    the count and AQE-skew-handled at the join; text itself never
    shuffles — only token pairs do."""
    t = tokens(F.col(text_col))
    pairs = (
        docs.select("doc_id", t.alias("t"))
        .where(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.struct(
                        F.element_at("t", i).alias("w1"),
                        F.element_at("t", i + F.lit(1)).alias("w2"),
                    ),
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
    )
    # pre-reduce per (doc, w1, w2): the per-occurrence multiplicity m —
    # every downstream join touches distinct doc-bigrams, not occurrences
    occ = pairs.groupBy("doc_id", "w1", "w2").agg(
        F.count(F.lit(1)).alias("m")
    )
    c2 = occ.groupBy("w1", "w2").agg(F.sum("m").alias("cb"))
    uni = docs.select(F.explode(t).alias("tok")).groupBy("tok").agg(
        F.count(F.lit(1)).alias("cu")
    )
    vocab = uni.count()
    if vocab == 0:
        return docs.select(
            "doc_id",
            F.lit(0).cast("long").alias("n_bigrams"),
            F.lit(None).cast("double").alias("xent_bits"),
        ).limit(0)
    scored = (
        occ.join(c2, ["w1", "w2"])
        .join(uni.withColumnRenamed("tok", "w1"), "w1")
        .select(
            "doc_id",
            "m",
            F.log2(
                (F.col("cb").cast("double") + F.lit(k))
                / (F.col("cu").cast("double") + F.lit(k * float(vocab)))
            ).alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("m").cast("long").alias("n_bigrams"),
        (-F.sum(F.col("m") * F.col("lp")) / F.sum("m")).alias("xent_bits"),
    )


def tfidf_keywords(
    docs: DataFrame,
    top_k: int = 5,
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """(doc_id, token, tf, df, score, rank) — the top ``top_k`` keywords
    per document by tf-idf: score = tf * ln(N / df) with N = corpus doc
    count and df = documents containing the token (lowercased whitespace
    tokens, the vocab_top_k convention). The standard cheap keyword /
    topic-signal extractor for corpus exploration and tagging.

    Rank order is (ROUND(score, 9) DESC, token ASC) — the 9 dp rounding
    happens BEFORE ranking in both this plan and the oracle, so a 1-ulp
    libm divergence between engines can never swap two near-equal scores
    and change the selected row set (exact-real score ties like
    2*ln(N/4) = ln(N/16) do occur in integer tf/df data). min_df prunes
    hapax noise before ranking.

    100 TB shape: explode + (doc, token) count + token-keyed df count,
    then ONE window partitioned by doc_id — bounded by tokens-per-doc,
    never corpus-wide; all shuffles are map-side-combined aggregations
    on doc or token keys."""
    from pyspark.sql import Window

    n_docs = docs.count()
    toks = docs.select(
        "doc_id", F.explode(tokens(F.lower(F.col(text_col)))).alias("token")
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    if min_df > 1:
        dfreq = dfreq.where(F.col("df") >= min_df)
    scored = tf.join(dfreq, "token").select(
        "doc_id",
        "token",
        "tf",
        "df",
        F.round(
            F.col("tf").cast("double")
            * F.log(F.lit(float(n_docs)) / F.col("df").cast("double")),
            9,
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= top_k)
        .select("doc_id", "token", "tf", "df", "score", "rank")
    )


def textrank_keywords(
    docs: DataFrame,
    top_k: int = 5,
    text_col: str = "text",
    damping: float = 0.85,
    n_iters: int = 8,
) -> DataFrame:
    """(doc_id, token, score, rank) — top ``top_k`` keywords per document
    by TextRank (Mihalcea & Tarau 2004): weighted PageRank over each
    document's OWN token-adjacency graph. Vertices are the doc's distinct
    lowercased whitespace tokens, undirected edges join ADJACENT token
    pairs (window 2, self-pairs dropped) weighted by adjacency count, and
    r_{t+1}(v) = (1-d)/N_doc + d * sum_u (w_uv / wdeg_u) * r_t(u) runs a
    FIXED ``n_iters`` synchronous rounds from the uniform start — graph-
    structural keyword salience, the order-aware complement of
    tfidf_keywords (which sees only counts). Docs whose token graph has
    no edges (under two distinct adjacent tokens) emit nothing.

    Rank order is (ROUND(score, 9) DESC, token ASC) with the rounding
    BEFORE ranking on both engines — the tfidf_keywords tie rule, so a
    last-ulp float-sum divergence cannot swap near-equal rows. The fixed
    schedule (no convergence test) is what makes the unrolled oracle an
    exact replay.

    100 TB shape: this is a grouped PageRank keyed by (doc_id, token) —
    millions of INDEPENDENT tiny graphs, not one global one. Everything
    partitions on doc_id(+token): one explode -> map-side-combined pair
    counts, a single-pass explode symmetrization (no double-evaluating
    union), and per round ONE join + ONE grouped aggregation, both
    co-partitioned on (doc_id, u) against the pinned, persisted fraction
    table. Text never shuffles — only (doc, token) pairs; no per-doc
    driver loop anywhere, so width scales with executors."""
    from pyspark.sql import Window

    from nido_spark.plans import truncate_lineage

    spark = docs.sparkSession
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    t = tokens(F.lower(F.col(text_col)))
    bg = (
        docs.select("doc_id", t.alias("t"))
        .where(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.struct(
                        F.element_at("t", i).alias("w1"),
                        F.element_at("t", i + F.lit(1)).alias("w2"),
                    ),
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
        .where(F.col("w1") != F.col("w2"))
    )
    pairs = (
        bg.select(
            "doc_id",
            F.least("w1", "w2").alias("a"),
            F.greatest("w1", "w2").alias("b"),
        )
        .groupBy("doc_id", "a", "b")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    und = pairs.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
                F.struct(F.col("b").alias("u"), F.col("a").alias("v")),
            )
        ).alias("e"),
        "w",
    ).select("doc_id", "e.u", "e.v", "w")
    wdeg = und.groupBy("doc_id", "u").agg(F.sum("w").alias("wd"))
    frac = (
        und.join(wdeg, ["doc_id", "u"])
        .select("doc_id", "u", "v", (F.col("w") / F.col("wd")).alias("f"))
        .repartition(nparts, "doc_id", "u")
        .persist()
    )
    verts = frac.select("doc_id", F.col("u").alias("tok")).distinct()
    nv = verts.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    base = 1.0 - damping
    r = truncate_lineage(
        verts.join(nv, "doc_id").select(
            "doc_id", "tok", "n", (F.lit(1.0) / F.col("n")).alias("r")
        )
    )
    for _ in range(n_iters):
        contrib = (
            frac.join(
                r.select("doc_id", F.col("tok").alias("u"), "r"),
                ["doc_id", "u"],
            )
            .groupBy("doc_id", F.col("v").alias("tok"))
            .agg(F.sum(F.col("f") * F.col("r")).alias("s"))
        )
        r = truncate_lineage(
            r.select("doc_id", "tok", "n")
            .join(contrib, ["doc_id", "tok"], "left")
            .select(
                "doc_id",
                "tok",
                "n",
                (
                    F.lit(base) / F.col("n")
                    + F.lit(damping) * F.coalesce("s", F.lit(0.0))
                ).alias("r"),
            )
        )
    frac.unpersist()
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        r.select(
            "doc_id",
            F.col("tok").alias("token"),
            F.round("r", 9).alias("score"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= top_k)
        .select("doc_id", "token", "score", "rank")
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 0,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_idx, n_tokens, chunk_text) — fixed-size token-window
    document chunking with overlap: the pretraining-sequence / RAG-passage
    splitter. stride = chunk_tokens - overlap; chunk i covers tokens
    [i*stride, i*stride + chunk_tokens); the final chunk keeps the short
    tail; zero-token docs emit nothing. chunk_text rejoins tokens with a
    single space — TOKEN-exact, not byte-exact (intra-doc whitespace runs
    are normalized; the whitespace ``tokens()`` convention). Requires
    0 <= overlap < chunk_tokens.

    Pure Catalyst and map-only: tokens -> sequence(0, nchunks-1) explode
    -> slice + array_join; no shuffle at all, so it scales as a straight
    scan. nchunks = max(1, floor((n - overlap - 1)/stride) + 1) — exactly
    the count of windows needed to cover every token once (the max(1,·)
    guards n <= overlap, where the float floor goes negative — and
    Spark's sequence(0, -1) would DESCEND, not return empty)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"chunk_documents: need 0 <= overlap ({overlap}) < "
            f"chunk_tokens ({chunk_tokens})"
        )
    stride = chunk_tokens - overlap
    t = docs.select("doc_id", tokens(F.col(text_col)).alias("_t"))
    t = t.withColumn("_n", F.size("_t")).where(F.col("_n") > 0)
    t = t.withColumn(
        "_nc",
        F.greatest(
            F.lit(1),
            (F.floor((F.col("_n") - F.lit(overlap) - 1) / F.lit(stride)) + 1),
        ).cast("long"),
    )
    ch = t.select(
        "doc_id",
        "_t",
        F.explode(F.sequence(F.lit(0), (F.col("_nc") - 1))).alias("chunk_idx"),
    )
    sl = F.slice(
        F.col("_t"), F.col("chunk_idx") * stride + 1, F.lit(chunk_tokens)
    )
    return ch.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size(sl).cast("long").alias("n_tokens"),
        F.array_join(sl, " ").alias("chunk_text"),
    )


def exact_quantiles(
    df: DataFrame, value_col: str, probs: list[float]
) -> DataFrame:
    """(p, q) — EXACT lower quantiles of an integer-valued column at
    corpus scale: q(p) = the smallest value whose cumulative count
    reaches ceil(p * n) (SQL PERCENTILE_DISC semantics). Built on the
    distinct-VALUE axis, the k-core H-index trick: groupBy(value) +
    count, then one cumulative-sum window over the distinct values — the
    window runs over O(distinct values) rows (document lengths, token
    counts: thousands), never O(rows), so a 10^11-doc corpus pays one
    map-side-combinable aggregation + one tiny single-partition window.
    The usual approx_percentile sketch trades accuracy for one pass;
    this is exact in the same pass count for low-cardinality integer
    metrics, and exactness is what makes the DuckDB oracle a plain
    PERCENTILE_DISC comparison. Quality-gate thresholds ("drop the
    bottom 5% by length") need the exact cut to be reproducible across
    engines and runs.

    The rank condition is cum / n >= p — the EXACT comparison
    PERCENTILE_DISC evaluates (cume_dist >= p), one IEEE division both
    engines compute identically. NOT ceil(p * n): representation error
    in the product (0.07 * 100 = 7.000000000000001) bumps ceil by one
    and returns the wrong quantile (review finding r5)."""
    from pyspark.sql import Window

    spark = df.sparkSession
    counts = df.groupBy(F.col(value_col).alias("val")).agg(
        F.count("*").alias("c")
    )
    w = Window.orderBy("val").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select(
        "val", F.sum("c").over(w).alias("cum"), F.sum("c").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n")
    )
    ps = spark.createDataFrame([(float(p),) for p in probs], "p double")
    return (
        F.broadcast(ps)
        .join(cum, F.col("cum") / F.col("n") >= F.col("p"))
        .groupBy("p")
        .agg(F.min("val").alias("q"))
    )


def collocations_llr(
    docs: DataFrame,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """(w1, w2, n, g2) — corpus collocation strength of adjacent token
    bigrams by Dunning's log-likelihood ratio (Dunning 1993), the
    statistically-sound replacement for raw PMI at corpus scale (PMI
    explodes on rare pairs; G2 accounts for the margins). Contingency
    per bigram over all N adjacent pairs: k11 = c(w1 w2), k12 = c(w1 .)
    - k11, k21 = c(. w2) - k11, k22 = N - k12 - k21 - k11; g2 =
    2 * sum k_ij ln(k_ij / E_ij), zero-count cells contribute 0.
    Margins come from the PAIR table itself (first-position / second-
    position counts), the bigram_logloss convention — so "w1 ." counts
    exclude each doc's final token by construction. min_count prunes
    the hapax tail BEFORE the join fan-out. Lowercased whitespace
    tokens; g2 rounded to 9 dp.

    100 TB shape: one explode -> map-side-combined (w1, w2) counts,
    margins are two reaggregations of that SAME count table (no second
    text scan), N is the one driver scalar; two margin joins are
    token-keyed and AQE-skew-handled. Text never shuffles."""
    t = tokens(F.lower(F.col(text_col)))
    bg = (
        docs.select(t.alias("t"))
        .where(F.size("t") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.struct(
                        F.element_at("t", i).alias("w1"),
                        F.element_at("t", i + F.lit(1)).alias("w2"),
                    ),
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    c1 = c12.groupBy("w1").agg(F.sum("n").alias("c1"))
    c2 = c12.groupBy("w2").agg(F.sum("n").alias("c2"))
    n_row = c12.agg(F.sum("n")).first()
    n_total = int(n_row[0] or 0)
    if n_total == 0:
        return c12.select(
            "w1", "w2", "n", F.lit(0.0).alias("g2")
        ).where(F.lit(False))

    def _term(k, e):
        return F.when(k > 0, k * F.log(k / e)).otherwise(F.lit(0.0))

    nn = F.lit(float(n_total))
    k11 = F.col("n").cast("double")
    k12 = (F.col("c1") - F.col("n")).cast("double")
    k21 = (F.col("c2") - F.col("n")).cast("double")
    k22 = nn - F.col("c1") - F.col("c2") + F.col("n")
    r1 = k11 + k12
    r2 = k21 + k22
    s1 = k11 + k21
    s2 = k12 + k22
    g2 = 2.0 * (
        _term(k11, r1 * s1 / nn)
        + _term(k12, r1 * s2 / nn)
        + _term(k21, r2 * s1 / nn)
        + _term(k22, r2 * s2 / nn)
    )
    return (
        c12.where(F.col("n") >= min_count)
        .join(c1, "w1")
        .join(c2, "w2")
        .select("w1", "w2", "n", F.round(g2, 9).alias("g2"))
    )


def readability(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_sents, n_words, words_per_sent, chars_per_word, fre) —
    syllable-free readability signals: sentence count (runs of [.!?]
    followed by whitespace or end — a run like '?!' is ONE boundary),
    whitespace word count, mean sentence length, mean word length
    (letters-only chars / words), and a Flesch-reading-ease-style proxy
    fre = 206.835 - 1.015 * words_per_sent - 84.6 * (chars_per_word /
    3.0) (chars/3 approximates syllables/word at ~3 letters per
    syllable — the standard estimator when no syllable dictionary ships
    to the cluster). The long-sentence/long-word band filter of a
    C4-style quality pipeline, complementary to quality_score's
    punctuation/stopword signals. Empty or wordless docs emit NULL
    ratios and fre. Map-only codegen: two regexp_count + the shared
    tokens() size, no shuffle at all.

    Sentence counting counts BOUNDARIES; text with words but no
    terminal punctuation counts as 1 sentence (the trailing fragment),
    i.e. n_sents = boundary_runs + (1 if text ends in a non-boundary
    word else 0) — rendered identically in the SQL oracle."""
    t = F.col(text_col)
    n_words = F.size(tokens(t))
    # boundary runs: [.!?]+ ; a trailing fragment (text not ending in a
    # boundary run, possibly followed by whitespace) adds one sentence
    bruns = F.regexp_count(t, F.lit(r"[.!?]+"))
    tail_frag = (
        F.regexp_count(t, F.lit(r"[^.!?\s][\s]*$")) > 0
    ).cast("int")
    n_sents = F.when(n_words > 0, bruns + tail_frag).otherwise(F.lit(0))
    n_letters = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    wps = F.when(n_sents > 0, n_words / n_sents)
    cpw = F.when(n_words > 0, n_letters / n_words)
    fre = F.when(
        (n_sents > 0) & (n_words > 0),
        F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * (cpw / F.lit(3.0)),
    )
    return docs.select(
        "doc_id",
        n_sents.cast("long").alias("n_sents"),
        n_words.cast("long").alias("n_words"),
        F.round(wps, 9).alias("words_per_sent"),
        F.round(cpw, 9).alias("chars_per_word"),
        F.round(fre, 9).alias("fre"),
    )

def char_entropy(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, n_distinct_chars, entropy_bits) — Shannon
    entropy of each document's character distribution, the classic
    compression-proxy quality signal (CCNet/Gopher-family filters):
    machine-generated or boilerplate text (repeated chars, base64 walls,
    ascii-art) sits far from natural language's ~4.0-4.5 bits/char band,
    in BOTH directions. Computed in the cancellation-free integer form
    H = log2(n) - (sum c_i * log2(c_i)) / n over exact per-char counts
    c_i, so the only float ops are log2 of exact integers (sub-ulp
    engine differences absorbed by 9 dp rounding). Empty/NULL texts emit
    n_chars = 0 with NULL entropy.

    100 TB shape: explode + two-stage aggregation LOOKS like a
    len(text)-row shuffle but is not — groupBy(doc_id, ch) partially
    aggregates map-side, and a document's rows never span scan tasks, so
    the exchange carries only sum_docs(distinct chars per doc) rows
    (~alphabet-size per doc), orders of magnitude below corpus bytes.
    The final per-doc rollup is the same key, second tiny shuffle.
    Left-join back to the doc table is by doc_id only (no text moves)."""
    ch = (
        docs.select("doc_id", F.explode(F.split(F.col(text_col), "")).alias("ch"))
        .where(F.col("ch") != "")
        .groupBy("doc_id", "ch")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per = ch.groupBy("doc_id").agg(
        F.sum("c").alias("n_chars"),
        F.count(F.lit(1)).alias("n_distinct_chars"),
        F.sum(F.col("c").cast("double") * F.log2(F.col("c"))).alias("_clogc"),
    )
    n = F.col("n_chars")
    ent = F.when(n > 0, F.log2(n) - F.col("_clogc") / n)
    return (
        docs.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(n, F.lit(0)).cast("long").alias("n_chars"),
            F.coalesce("n_distinct_chars", F.lit(0)).cast("long").alias(
                "n_distinct_chars"
            ),
            F.round(ent, 9).alias("entropy_bits"),
        )
    )


def unigram_kl(
    docs_a: DataFrame,
    docs_b: DataFrame,
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """One row ``(vocab, n_tokens_a, n_tokens_b, kl_ab, kl_ba)`` — KL
    divergence between the add-alpha-smoothed unigram distributions of two
    corpus slices (lowercased whitespace tokens, the vocab_top_k
    tokenizer). The standard domain-shift / contamination monitor: KL of
    a candidate slice against the training mix, or of this week's crawl
    against last week's.

        p_t = (c_a(t) + alpha) / (N_a + alpha*V)   over the UNION vocab V
        kl_ab = sum_t p_t * ln(p_t / q_t)          (nats; >= 0)

    Smoothing over the union vocab makes both distributions strictly
    positive, so both directions are finite. Counts and totals are exact
    integers; the two divergences are rounded to 9 dp (cross-engine float
    convention — summation order differs, rounding absorbs it).

    100 TB shape: one explode+groupBy per slice (map-side combined), ONE
    full-outer join on the token (the union vocab), totals as a broadcast
    one-row crossJoin, and a single final aggregation. The token tables
    are the only shuffles; nothing is collected."""
    def counts(d: DataFrame, name: str) -> DataFrame:
        return (
            d.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias(name))
        )

    ca = counts(docs_a, "ca")
    cb = counts(docs_b, "cb")
    joined = (
        ca.join(cb, "token", "full_outer")
        .select(
            F.coalesce(F.col("ca"), F.lit(0)).alias("ca"),
            F.coalesce(F.col("cb"), F.lit(0)).alias("cb"),
        )
    )
    totals = joined.agg(
        F.count(F.lit(1)).alias("vocab"),
        F.sum("ca").alias("n_a"),
        F.sum("cb").alias("n_b"),
    )
    al = F.lit(float(alpha))
    p = (F.col("ca") + al) / (F.col("n_a") + al * F.col("vocab"))
    q = (F.col("cb") + al) / (F.col("n_b") + al * F.col("vocab"))
    return (
        joined.crossJoin(F.broadcast(totals))
        .agg(
            F.first("vocab").alias("vocab"),
            F.first("n_a").alias("n_tokens_a"),
            F.first("n_b").alias("n_tokens_b"),
            F.round(F.sum(p * F.log(p / q)), 9).alias("kl_ab"),
            F.round(F.sum(q * F.log(q / p)), 9).alias("kl_ba"),
        )
    )


def _bpe_merge_apply(syms, left: str, right: str):
    """Column expr: greedy left-to-right replacement of adjacent
    (left, right) symbol pairs with their concatenation — the classic BPE
    apply step as ONE engine-side aggregate fold (no Python per row).
    State: (acc, carry) where carry holds a just-seen ``left`` awaiting
    its ``right``; merge wins over re-arming when left == right."""
    l_lit = F.lit(left)
    merged = F.lit(left + right)
    nul = F.lit(None).cast("string")

    def step(st, s):
        acc, carry = st["acc"], st["carry"]
        return F.when(
            carry.isNull(),
            F.when(s == l_lit, F.struct(acc.alias("acc"), s.alias("carry")))
            .otherwise(
                F.struct(F.array_append(acc, s).alias("acc"), nul.alias("carry"))
            ),
        ).otherwise(
            F.when(
                s == F.lit(right),
                F.struct(F.array_append(acc, merged).alias("acc"), nul.alias("carry")),
            )
            .when(s == l_lit,
                  F.struct(F.array_append(acc, carry).alias("acc"), s.alias("carry")))
            .otherwise(
                F.struct(
                    F.array_append(F.array_append(acc, carry), s).alias("acc"),
                    nul.alias("carry"),
                )
            )
        )

    init = F.struct(
        F.array().cast("array<string>").alias("acc"), nul.alias("carry")
    )
    fin = lambda st: F.when(  # noqa: E731
        st["carry"].isNull(), st["acc"]
    ).otherwise(F.array_append(st["acc"], st["carry"]))
    return F.aggregate(syms, init, step, fin)


def learn_bpe_merges(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 1,
) -> DataFrame:
    """(rank, left, right, cnt) — the first ``n_merges`` byte-pair-encoding
    merges learned from the corpus (Sennrich et al. 2016), the tokenizer-
    training step of an LLM data pipeline. Deterministic: each round picks
    the (cnt DESC, left ASC, right ASC) argmax over OVERLAPPING adjacent
    symbol-pair counts weighted by word-type frequency (the reference
    get_stats convention), then rewrites the vocab greedily left-to-right.
    Stops early when no pair reaches ``min_pair_count`` (the returned
    table then has fewer than n_merges rows).

    100 TB shape: the corpus is touched ONCE (lowercased whitespace word-
    type counts — the vocab_top_k aggregation); every merge round then
    runs over the word-TYPE table (10^6-10^8 rows at web scale, not the
    10^12-token corpus): one pair explode + map-side-combined groupBy,
    one TakeOrderedAndProject argmax (the single 1-row driver action per
    round — BPE is inherently a sequential argmax chain), and one
    engine-side aggregate-fold rewrite; vocab state is lineage-truncated
    per round. Nothing else is collected."""
    from nido_spark.plans import truncate_lineage

    if n_merges < 1:
        raise ValueError("learn_bpe_merges: n_merges must be >= 1")
    words = (
        docs.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    vocab = truncate_lineage(
        words.select(F.split("w", "").alias("syms"), "cnt")
    )
    spark = docs.sparkSession
    out: list[tuple[int, str, str, int]] = []
    for rank in range(int(n_merges)):
        pairs = (
            vocab.where(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(slice(syms, 1, size(syms) - 1), "
                        "(x, i) -> struct(x AS l, syms[i + 1] AS r))"
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("c"))
            .where(F.col("c") >= int(min_pair_count))
        )
        top = pairs.orderBy(
            F.col("c").desc(), F.col("l").asc(), F.col("r").asc()
        ).limit(1).collect()
        if not top:
            break
        l, r, c = top[0]["l"], top[0]["r"], int(top[0]["c"])
        out.append((rank, l, r, c))
        vocab = truncate_lineage(
            vocab.select(_bpe_merge_apply(F.col("syms"), l, r).alias("syms"), "cnt")
        )
    return spark.createDataFrame(
        out, "rank long, left string, right string, cnt long"
    )


def bpe_token_counts(
    docs: DataFrame,
    merges,
    text_col: str = "text",
    truncate_every: int = 16,
) -> DataFrame:
    """(doc_id, n_tokens) — the TRUE subword count of each document under
    a learned BPE merge table (``learn_bpe_merges`` output, or
    ``[(left, right), ...]`` in rank order): the tokenizer-APPLY step
    that turns ``token_count_bpe``'s regex proxy into exact budget
    accounting once the vocab exists. Same tokenization as training
    (lowercased regex-trim whitespace words); docs with no words (empty
    or all-whitespace text) produce no row, matching the word explode.

    100 TB shape: merges apply over the word-TYPE table (distinct words
    — 10^6-10^8 rows at web scale, never the 10^12-token stream) as
    chained engine-side aggregate folds (``_bpe_merge_apply``, no Python
    per row), lineage-truncated every ``truncate_every`` merges so
    expression depth stays bounded at any merge count; the corpus is
    touched twice (word explode for the vocab; word explode + join on
    the encoded vocab + per-doc sum — the join side is the tiny vocab,
    broadcast below the join threshold). The only collect is the merge
    table itself, n_merges rows by construction."""
    from nido_spark.plans import truncate_lineage

    if isinstance(merges, DataFrame):
        merges = [
            (r["left"], r["right"]) for r in merges.orderBy("rank").collect()
        ]
    merges = list(merges)
    words = docs.select(
        "doc_id", F.explode(tokens(F.lower(F.col(text_col)))).alias("w")
    )
    vocab = truncate_lineage(
        words.select("w").distinct().select("w", F.split("w", "").alias("syms"))
    )
    for i, (left, right) in enumerate(merges):
        vocab = vocab.select(
            "w", _bpe_merge_apply(F.col("syms"), str(left), str(right)).alias("syms")
        )
        if (i + 1) % int(truncate_every) == 0 and i + 1 < len(merges):
            vocab = truncate_lineage(vocab)
    enc = vocab.select("w", F.size("syms").alias("n_syms"))
    return (
        words.join(enc, "w")
        .groupBy("doc_id")
        .agg(F.sum("n_syms").cast("long").alias("n_tokens"))
    )


def text_tiles(
    docs: DataFrame, w: int = 10, text_col: str = "text"
) -> DataFrame:
    """TextTiling-style topic segmentation (Hearst 1997): per-gap lexical
    cohesion scores and boundary flags. For every within-document token
    gap g (g in [w, n_tokens - w]), score = Jaccard similarity of the
    DISTINCT token sets of the w tokens before vs the w tokens after the
    gap; a gap is a segment boundary when it is a cohesion VALLEY
    (score < previous gap's AND score <= next gap's) — the deterministic
    rendering of TextTiling's depth scoring (no smoothing pass, strict-<
    on the left so a plateau marks only its first gap). Returns
    (doc_id, gap, score, is_boundary); documents shorter than 2w tokens
    yield no rows.

    Distributed shape: one map-side explode fans each token into its 2w
    (gap, side) block memberships (sequence + transform, no join against
    a gap table), everything after is (doc_id, gap)-keyed aggregation —
    no self-joins, no per-doc collects; cost is the textbook O(n * w)
    with w a small constant. Exchanges carry (doc_id, gap, side, token);
    at petabyte scale dictionary-encode or hash the token column first —
    kept as strings here so the DuckDB oracle compares the exact sets.
    Scores are integer-count divisions (exactly rounded IEEE doubles),
    so the valley comparisons are engine-portable bit-for-bit."""
    from pyspark.sql import Window

    from nido_spark.plans import truncate_lineage

    tok = docs.select(
        "doc_id",
        F.posexplode(tokens(F.col(text_col))).alias("p", "tok"),
    )
    nt = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_nt"))
    left = F.transform(
        F.sequence(F.col("p") + 1, F.col("p") + w),
        lambda g: F.struct(F.lit(0).alias("side"), g.alias("g")),
    )
    right = F.transform(
        F.sequence(F.col("p") - w + 1, F.col("p")),
        lambda g: F.struct(F.lit(1).alias("side"), g.alias("g")),
    )
    memb = (
        tok.select("doc_id", "tok", F.explode(F.concat(left, right)).alias("_m"))
        .select("doc_id", "tok", "_m.side", "_m.g")
        .join(nt, "doc_id")
        .where((F.col("g") >= w) & (F.col("g") <= F.col("_nt") - w))
        .select("doc_id", "g", "side", "tok")
        .distinct()
    )
    score = (
        memb.groupBy("doc_id", "g", "tok")
        .agg(F.count(F.lit(1)).alias("_sides"))
        .groupBy("doc_id", "g")
        .agg(
            (
                F.sum((F.col("_sides") == 2).cast("long")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("score")
        )
    )
    score = truncate_lineage(score)
    wd = Window.partitionBy("doc_id").orderBy("g")
    return score.select(
        "doc_id",
        F.col("g").alias("gap"),
        "score",
        F.coalesce(
            (F.col("score") < F.lag("score").over(wd))
            & (F.col("score") <= F.lead("score").over(wd)),
            F.lit(False),
        ).alias("is_boundary"),
    )
