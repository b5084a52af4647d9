from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from nido_spark import dedup as D
from nido_spark import similarity as S
from nido_spark import textops as X

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="session")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_token_count(spark):
    df = spark.createDataFrame(
        [(1, "hello  world foo"), (2, ""), (3, "   "), (4, "one")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_tokens"] for r in X.token_count(df).collect()}
    assert got == {1: 3, 2: 0, 3: 0, 4: 1}


def test_quality_score_ranges(docs):
    q = X.quality_score(docs).collect()
    assert len(q) == docs.count()
    for r in q:
        assert 0.0 <= r["punct_ratio"] <= 1.0
        assert 0.0 <= r["stopword_ratio"] <= 1.0
        assert 0.0 <= r["quality"] <= 1.0


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog is here"),
            (2, "der hund und die katze ist da"),
            (3, "le chat et la mer est grande"),
            (4, "xyzzy plugh"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang_pred"] for r in X.lang_id(df).collect()}
    assert got[1] == "en" and got[2] == "de" and got[3] == "fr" and got[4] == "und"


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "Hello World"), (2, "hello world  "), (3, "unique"), (4, "HELLO WORLD")],
        "doc_id long, text string",
    )
    # canonicalization is lower(trim(text)): 1, 2 (trailing spaces trimmed)
    # and 4 all collide
    dups = D.exact_duplicates(df).collect()
    assert len(dups) == 1 and dups[0]["n_docs"] == 3 and dups[0]["keep_id"] == 1
    kept = sorted(r["doc_id"] for r in D.exact_dedup(df).collect())
    assert kept == [1, 3]


def test_minhash_finds_near_dupes(spark):
    base = "the quick brown fox jumps over the lazy dog " * 6
    near = base.replace("lazy", "sleepy", 1)
    far = "completely different content about spark engines " * 6
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    pairs = D.minhash_dedup(df, threshold=0.5).collect()
    assert {(p["a"], p["b"]) for p in pairs} == {(1, 2)}
    assert pairs[0]["jaccard"] > 0.8


def test_minhash_signature_deterministic(docs):
    s1 = D.minhash_signatures(docs.limit(20)).collect()
    s2 = D.minhash_signatures(docs.limit(20).repartition(7)).collect()
    assert {r["doc_id"]: r["sig"] for r in s1} == {r["doc_id"]: r["sig"] for r in s2}


def test_simhash_distance_orders_by_similarity(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta " * 4
    near = base.replace("zeta", "zetb")
    far = "one two three four five six seven eight nine ten " * 4
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    sigs = {r["doc_id"]: r["simhash"] for r in D.simhash_signatures_stable(df).collect()}

    def ham(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    assert ham(sigs[1], sigs[2]) < ham(sigs[1], sigs[3])
    assert ham(sigs[1], sigs[2]) < ham(sigs[2], sigs[3])
    # determinism across partitionings
    sigs2 = {
        r["doc_id"]: r["simhash"]
        for r in D.simhash_signatures_stable(df.repartition(3)).collect()
    }
    assert sigs == sigs2


def test_hamming_near_pairs_banding(spark):
    # 4x16-bit bands: dist<=3 guaranteed found (pigeonhole); a pair whose
    # diff bits hit all 4 bands is not a candidate
    s1 = 0x0123456789ABCDEF
    s2 = s1 ^ 0b101  # 2 bits, same band
    s3 = s1 ^ ((1 << 0) | (1 << 16) | (1 << 32) | (1 << 48))  # every band differs
    df = spark.createDataFrame(
        [(1, s1), (2, s2), (3, s3)], "doc_id long, simhash long"
    )
    got = {(p["a"], p["b"]): p["dist"] for p in D.hamming_near_pairs(df, max_dist=10).collect()}
    assert got == {(1, 2): 2}


def test_cosine_topk_exact(emb, spark):
    queries = emb.limit(3)
    topk = S.cosine_topk(emb, queries, k=5).collect()
    by_q = {}
    for r in topk:
        by_q.setdefault(r["query_id"], []).append(r)
    # NumPy oracle
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mat_n = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    for qid, got in by_q.items():
        qi = np.where(ids == qid)[0][0]
        cos = mat_n @ mat_n[qi]
        cos[qi] = -np.inf
        order = np.lexsort((ids, -cos))[:5]
        want = ids[order].tolist()
        got_sorted = [r["nbr_id"] for r in sorted(got, key=lambda r: r["rank"])]
        assert got_sorted == want
        for r in got:
            oracle_cos = float(mat_n[np.where(ids == r["nbr_id"])[0][0]] @ mat_n[qi])
            assert r["cos"] == pytest.approx(oracle_cos, abs=1e-6)


def test_lsh_ann_recall(emb):
    queries = emb.limit(5)
    exact = S.cosine_topk(emb, queries, k=5)
    approx = S.lsh_ann_topk(emb, queries, k=5, n_bits=16, n_bands=8)
    e = {(r["query_id"], r["nbr_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["nbr_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.4  # 8 bands of 2 bits -> high recall on 500 vecs


def test_ivf_ann_recall(emb):
    queries = emb.limit(5)
    exact = S.cosine_topk(emb, queries, k=5)
    approx = S.ivf_ann_topk(emb, queries, k=5, n_lists=8, n_probe=3)
    e = {(r["query_id"], r["nbr_id"]) for r in exact.collect()}
    a_rows = approx.collect()
    a = {(r["query_id"], r["nbr_id"]) for r in a_rows}
    recall = len(e & a) / len(e)
    assert recall >= 0.5  # probing 3/8 cells on 500 vecs
    # every reported cos must equal the exact cosine (re-rank is exact)
    exact_cos = {(r["query_id"], r["nbr_id"]): r["cos"] for r in
                 S.cosine_topk(emb, queries, k=500).collect()}
    for r in a_rows:
        key = (r["query_id"], r["nbr_id"])
        if key in exact_cos:
            assert abs(r["cos"] - exact_cos[key]) < 1e-9


def test_topk_plan_has_no_corpus_collect_list(emb):
    """VERDICT r1 item 4 regression: the top-k tail must be windowed
    row_number, never a collect_list over the whole corpus per query."""
    plan = S.cosine_topk(emb, emb.limit(3), k=5)._jdf.queryExecution().toString()
    assert "collect_list" not in plan
    plan2 = S.lsh_ann_topk(emb, emb.limit(3), k=5)._jdf.queryExecution().toString()
    assert "collect_list" not in plan2


def test_fuzzy_dedup_transitive_clusters(spark):
    """A~B and B~C near-dups (A!~C below threshold is fine) must collapse to
    ONE cluster with the smallest doc_id surviving; untouched docs survive."""
    base = "the quick brown fox jumps over the lazy dog again and again " * 8
    b = base.replace("lazy", "sleepy", 1)
    c = b.replace("quick", "rapid", 1)
    df = spark.createDataFrame(
        [(10, base), (11, b), (12, c), (20, "entirely unrelated content " * 10)],
        "doc_id long, text string",
    )
    pairs = D.minhash_dedup(df, threshold=0.5)
    clusters = {r["doc_id"]: r["cluster"] for r in D.dedup_clusters(pairs).collect()}
    assert clusters == {10: 10, 11: 10, 12: 10}
    kept = sorted(r["doc_id"] for r in D.fuzzy_dedup(df, threshold=0.5).collect())
    assert kept == [10, 20]


def test_prepare_corpus_stages_compose(spark):
    """Exact dup, fuzzy dup, low-quality, and wrong-language docs are all
    dropped; the clean English doc survives with its metrics."""
    from nido_spark.pipeline import prepare_corpus

    good = ("the quick brown fox jumps over the lazy dog and runs to the "
            "river where it drinks the cool water in the morning sun") * 2
    fuzzy = good.replace("lazy", "sleepy", 1)
    german = ("der hund und die katze ist da und der vogel ist hier oben "
              "und das haus ist alt") * 2
    rows = [
        (1, good),
        (2, good),          # exact dup of 1 -> dropped
        (3, fuzzy),         # fuzzy dup of 1 -> dropped
        (4, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"),  # junk -> quality 0
        (5, german),        # de -> dropped by lang allowlist
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = prepare_corpus(df, min_quality=0.3, langs=("en",), jaccard_threshold=0.5)
    got = {r["doc_id"]: r for r in out.collect()}
    assert set(got) == {1}
    assert got[1]["lang_pred"] == "en"
    assert got[1]["quality"] >= 0.3
    assert got[1]["n_tokens"] > 20


def test_lsh_degenerate_bucket_cap(spark):
    """1k near-identical short docs collapse into one band bucket; with the
    cap the self-join is bounded (bucket dropped), without it the pair count
    is quadratic. Also: capped run completes and exact-dedup-first removes
    the pathology entirely."""
    rows = [(i, "spam spam spam spam spam") for i in range(1000)]
    rows.append((5000, "totally different and unique text right here"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = D.minhash_signatures(df)
    capped = D.lsh_candidate_pairs(sigs, max_bucket_size=100)
    assert capped.count() == 0  # degenerate bucket dropped, bounded work
    # the intended pipeline: exact dedup first leaves nothing degenerate
    survivors = D.exact_dedup(df)
    assert survivors.count() == 2
    pairs = D.minhash_dedup(survivors, threshold=0.5)
    assert pairs.count() == 0


def test_sample_and_shard_deterministic_and_balanced(docs, spark):
    from nido_spark.pipeline import assign_shards, sample_corpus

    s1 = sorted(r["doc_id"] for r in sample_corpus(docs, 0.25, seed=7).collect())
    s2 = sorted(
        r["doc_id"]
        for r in sample_corpus(docs.repartition(13), 0.25, seed=7).collect()
    )
    assert s1 == s2  # partition-layout independent
    n = docs.count()
    assert 0.18 * n <= len(s1) <= 0.32 * n  # close to the nominal rate
    # different seeds give different slices
    s3 = sorted(r["doc_id"] for r in sample_corpus(docs, 0.25, seed=8).collect())
    assert s1 != s3
    # shards cover every doc exactly once, reasonably balanced
    sh = assign_shards(docs, n_shards=4, seed=11)
    counts = {r["shard"]: r["c"] for r in
              sh.groupBy("shard").agg(F.count("*").alias("c")).collect()}
    assert set(counts) == {0, 1, 2, 3}
    assert sum(counts.values()) == n
    assert max(counts.values()) <= 2 * min(counts.values())


def test_winnow_fingerprints_shared_substring_guarantee(spark):
    """Winnowing guarantee (Schleimer et al. 2003): two docs sharing a
    substring of length >= k + window - 1 share >= 1 fingerprint; disjoint
    texts share none; partition-layout independent."""
    shared = "a very distinctive shared passage of text"
    df = spark.createDataFrame(
        [
            (1, "prefix one " + shared + " suffix alpha"),
            (2, "other start " + shared + " different end"),
            (3, "zq zq zq completely unrelated material 12345 zq"),
        ],
        "doc_id long, text string",
    )
    fps = {}
    for r in X.winnow_fingerprints(df, k=5, window=4).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[1] & fps[2]          # shared passage -> shared fingerprint
    assert not (fps[1] & fps[3])    # disjoint content -> disjoint prints
    fps2 = {}
    for r in X.winnow_fingerprints(df.repartition(3), k=5, window=4).collect():
        fps2.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps == fps2


def test_bucket_hash_safe_for_full_int64_id_range(spark):
    """Review fix: 64-bit hash-derived doc_ids (>= 2^33) must neither throw
    ANSI ARITHMETIC_OVERFLOW nor silently wrap — the split-multiply must
    equal the plain formula (A1*((id mod P)+seed)+B1) mod P computed in
    unbounded Python ints, for ids across the whole int64 range."""
    from nido_spark.pipeline import (
        _SAMPLE_A1, _SAMPLE_B1, _SAMPLE_A2, _SAMPLE_B2, _SAMPLE_P, _SAMPLE_P2,
        _bucket,
    )

    seed = 7
    ids = [0, 1, 12345, 2**31, 2**33 + 17, 2**40 + 3, 2**62 - 5, 2**63 - 1,
           -1, -(2**62)]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    with_ansi = df.sparkSession.conf.get("spark.sql.ansi.enabled")
    got = {
        r["doc_id"]: r["b"]
        for r in df.select("doc_id", _bucket("doc_id", seed).alias("b")).collect()
    }

    def ref(i):
        r1 = (_SAMPLE_A1 * ((i % _SAMPLE_P) + seed) + _SAMPLE_B1) % _SAMPLE_P
        return (_SAMPLE_A2 * (r1 % (1 << 30)) + _SAMPLE_B2) % _SAMPLE_P2

    assert got == {i: ref(i) for i in ids}, f"ansi={with_ansi}"


def test_driver_fixture_jaccard_is_bimodal():
    """Pins the fixture invariant the driver's minhash/fuzzy-dedup equality
    gates depend on (see __spark_entry__._jaccard_pairs_cte): 8-band/4-row
    LSH misses mid-band pairs with probability ~(1-J^4)^8, so comparing LSH
    output against an EXHAUSTIVE Jaccard oracle is only sound while the
    fixture has no pairs in the miss-risk band [0.4, 0.9). If a regenerated
    fixture breaks this, the driver gates become probabilistically flaky —
    fix by restricting the oracle to the high-recall band and asserting
    recall separately, not by rerolling seeds until green."""
    import os

    import duckdb

    path = "/root/testdata/sf0.01/documents.parquet"
    if not os.path.exists(path):
        import pytest as _pytest

        _pytest.skip("driver fixture not present")
    con = duckdb.connect()
    n_mid = con.execute(f"""
WITH t AS (SELECT doc_id, lower(trim(text)) AS txt
           FROM read_parquet('{path}')),
grams AS (
  SELECT DISTINCT doc_id, substring(txt, CAST(i AS INT), 5) AS g
  FROM t, LATERAL unnest(generate_series(1, GREATEST(length(txt) - 4, 0))) AS u(i)
  WHERE length(txt) >= 5),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY 1),
inter AS (SELECT g1.doc_id AS a, g2.doc_id AS b, COUNT(*) AS isz
  FROM grams g1 JOIN grams g2 ON g1.g = g2.g AND g1.doc_id < g2.doc_id
  GROUP BY 1, 2)
SELECT COUNT(*) FROM inter
JOIN sizes sa ON inter.a = sa.doc_id
JOIN sizes sb ON inter.b = sb.doc_id
WHERE isz * 1.0 / (sa.sz + sb.sz - isz) BETWEEN 0.4 AND 0.9
""").fetchone()[0]
    assert n_mid == 0, (
        f"{n_mid} document pairs in the LSH miss-risk Jaccard band "
        f"[0.4, 0.9) — the driver's exact-equality dedup gates are no "
        f"longer statistically sound on this fixture"
    )


def test_ngram_decontaminate_flags_only_overlapping_docs(spark):
    from nido_spark.textops import ngram_decontaminate

    shared = " ".join(f"tok{i}" for i in range(13))
    train = spark.createDataFrame(
        [
            (1, f"prefix {shared} suffix"),          # contains the eval 13-gram
            (2, "a completely different document with plenty of words "
                "but nothing shared beyond short overlaps"),
            (3, shared),                              # exactly the 13-gram
            (4, " ".join(f"tok{i}" for i in range(12))),  # only 12 tokens
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, f"intro {shared} outro")], "doc_id long, text string"
    )
    got = sorted(r["doc_id"] for r in ngram_decontaminate(train, ev, n=13).collect())
    assert got == [1, 3]


def test_repetition_stats_fractions(spark):
    from nido_spark.textops import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "same line\nsame line\nsame line\nother"),   # 2/4 dup lines
            (2, "ha ha ha ha ha"),                            # one bigram 4/4
            (3, "all words here are distinct tokens"),
            (4, ""),                                          # degenerate
            (5, "one"),                                       # < 2 tokens
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert got[1]["n_lines"] == 4 and abs(got[1]["dup_line_frac"] - 0.5) < 1e-12
    assert abs(got[2]["top_bigram_frac"] - 1.0) < 1e-12
    assert got[3]["dup_line_frac"] == 0.0
    assert abs(got[3]["top_bigram_frac"] - 0.2) < 1e-12  # 5 bigrams, each once
    assert got[4]["n_lines"] == 0 and got[4]["dup_line_frac"] == 0.0
    assert got[5]["top_bigram_frac"] == 0.0


def test_redact_pii_counts_and_replacement(spark):
    from nido_spark.textops import redact_pii

    docs = spark.createDataFrame(
        [
            (1, "mail alice@example.com or 555-123-4567, ssn 123-45-6789, ip 10.0.0.1"),
            (2, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    r = got[1]
    assert (r["n_email"], r["n_ssn"], r["n_phone"], r["n_ipv4"]) == (1, 1, 1, 1)
    for tok in ("<EMAIL>", "<SSN>", "<PHONE>", "<IPV4>"):
        assert tok in r["clean_text"]
    for leak in ("alice", "4567", "6789", "10.0.0.1"):
        assert leak not in r["clean_text"]
    assert got[2]["clean_text"] == "nothing sensitive here"
    assert got[2]["n_email"] == 0


def test_split_corpus_disjoint_exhaustive_superset_stable(docs, spark):
    """Train/val/test split: every doc assigned exactly once, assignment
    is partition-invariant, ratio-accurate, superset-stable (splitting a
    superset never moves an existing doc across splits), and invalid
    ratios raise."""
    import pytest as _pytest

    from nido_spark.pipeline import split_corpus

    out = split_corpus(docs, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=13)
    n = docs.count()
    assert out.count() == n  # exhaustive: no row dropped or duplicated
    counts = {r["split"]: r["c"] for r in
              out.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert 0.7 * n <= counts["train"] <= 0.9 * n
    # partition-invariant
    a = sorted((r["doc_id"], r["split"]) for r in out.collect())
    b = sorted(
        (r["doc_id"], r["split"])
        for r in split_corpus(
            docs.repartition(17), {"train": 0.8, "val": 0.1, "test": 0.1},
            seed=13,
        ).collect()
    )
    assert a == b
    # superset-stable: splitting half the corpus agrees with the full split
    half = docs.where(F.col("doc_id") % 2 == 0)
    ha = sorted(
        (r["doc_id"], r["split"])
        for r in split_corpus(
            half, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=13
        ).collect()
    )
    assert ha == [p for p in a if p[0] % 2 == 0]
    with _pytest.raises(ValueError):
        split_corpus(docs, {"train": 0.5, "val": 0.1}, seed=13)  # sums to 0.6
    with _pytest.raises(ValueError):
        split_corpus(docs, {}, seed=13)


def test_sample_stratified_rates_and_determinism(docs, spark):
    from nido_spark.pipeline import sample_corpus, sample_stratified

    rates = {"en": 0.5, "de": 0.25}
    s1 = sorted(r["doc_id"] for r in sample_stratified(docs, rates, seed=7).collect())
    s2 = sorted(
        r["doc_id"]
        for r in sample_stratified(docs.repartition(9), rates, seed=7).collect()
    )
    assert s1 == s2 and len(s1) > 0  # partition-layout independent
    langs = {r["lang"] for r in sample_stratified(docs, rates, seed=7).collect()}
    assert langs <= set(rates)  # unlisted strata dropped
    # composes with the uniform sampler: the en stratum at rate r is
    # EXACTLY sample_corpus(rate=r) restricted to en (same hash, same seed)
    en_uniform = {
        r["doc_id"]
        for r in sample_corpus(docs.where(F.col("lang") == "en"), 0.5, seed=7).collect()
    }
    en_strat = {
        r["doc_id"]
        for r in sample_stratified(docs, rates, seed=7).where(F.col("lang") == "en").collect()
    }
    assert en_strat == en_uniform


def test_dup_spans_planted_overlap(spark):
    # two docs share one long planted region amid unique prose; a third is
    # fully unique. Winnowing guarantee: the shared region (len 260 >>
    # k+window-1=27) must surface as one island in BOTH docs, the unique
    # doc must surface nothing, and spans may overshoot the plant by at
    # most gap+k+window-1 chars on either side (island slop).
    plant = ("the quick brown fox jumps over the lazy dog while the "
             "band plays an entirely memorable tune about graph engines "
             "and the art of deduplicating training corpora at scale "
             "with winnowed fingerprints and islands of matched positions "
             "covering every shared substring precisely") [:260]
    import hashlib
    def prose(seed, n):
        out = []
        h = str(seed)
        while sum(len(x) + 1 for x in out) < n:
            h = hashlib.md5(h.encode()).hexdigest()
            out.append(h)
        return " ".join(out)[:n]
    a = prose("a", 300) + " " + plant + " " + prose("aa", 250)
    b = prose("b", 200) + " " + plant + " " + prose("bb", 350)
    c = prose("c", 800)
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    k, w = 20, 8
    spans = X.dup_spans(docs, k=k, window=w, min_len=100).collect()
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {1, 2}
    slop = (k + w) + (k + w - 1)  # gap + span extension
    for doc_id, text in ((1, a), (2, b)):
        [s] = by_doc[doc_id]
        start = text.lower().strip().find(plant.lower())
        end = start + len(plant)
        # span covers the interior of the plant and stays within slop
        assert s["span_start"] <= start + slop
        assert s["span_end"] >= end - slop
        assert s["span_start"] >= start - slop
        assert s["span_end"] <= end + slop


def test_remove_spans_excises_and_passes_through(spark):
    docs = spark.createDataFrame(
        [(1, "AAAABBBBCCCCDDDD"), (2, "  KeepMe  ")],
        "doc_id long, text string",
    )
    # overlapping + adjacent spans on doc 1: [2,6) and [4,10) -> cut [2,10)
    spans = spark.createDataFrame(
        [(1, 2, 6), (1, 4, 10)], "doc_id long, span_start long, span_end long"
    )
    got = {r["doc_id"]: r["clean_text"] for r in X.remove_spans(docs, spans).collect()}
    norm = "aaaabbbbccccdddd"
    assert got[1] == norm[:2] + norm[10:]
    assert got[2] == "keepme"  # no spans -> normalized pass-through


def test_remove_spans_kills_planted_duplicate(spark):
    shared = ("shared boilerplate sentence that appears verbatim in both "
              "documents and is long enough to be a span on its own, "
              "well past the hundred character minimum for removal")
    intro1 = "unique intro one with plenty of its own distinct words before anything shared shows up here. "
    outro1 = " and a closing unique tail one."
    intro2 = "different opening two that likewise has enough unshared characters to survive edge slop fully. "
    outro2 = " plus another distinct ending two."
    docs = spark.createDataFrame(
        [(1, intro1 + shared + outro1), (2, intro2 + shared + outro2)],
        "doc_id long, text string",
    )
    spans = X.dup_spans(docs, k=20, window=8, min_len=100)
    clean = {r["doc_id"]: r["clean_text"]
             for r in X.remove_spans(docs, spans).collect()}
    core = "hundred character minimum"
    for d in (1, 2):
        assert core not in clean[d]
    # unique flanks survive (up to window+k-1 = 27 chars may be shaved at
    # each span edge — the window-min can bind to an in-region gram from a
    # window position that starts before the region)
    assert clean[1].startswith("unique intro one")
    assert clean[2].startswith("different opening two")


def test_dup_spans_within_doc_scope(spark):
    """within_doc=True flags substrings a doc repeats inside itself;
    the default cross-doc scope must NOT (no second document involved).
    A single occurrence never self-triggers (consecutive windows that
    re-select the same min gram are one occurrence)."""
    import hashlib

    def prose(seed, n):
        out, h = [], str(seed)
        while sum(len(x) + 1 for x in out) < n:
            h = hashlib.md5(h.encode()).hexdigest()
            out.append(h)
        return " ".join(out)[:n]

    boiler = ("this exact boilerplate paragraph is repeated twice within "
              "one single document and exceeds the minimum span length "
              "threshold comfortably for the within scope test")
    doc1 = prose("u1", 150) + " " + boiler + " " + prose("u2", 150) + " " + boiler + " " + prose("u3", 150)
    doc2 = prose("v", 700)  # unique, no repeats
    docs = spark.createDataFrame(
        [(1, doc1), (2, doc2)], "doc_id long, text string"
    )
    kw = dict(k=20, window=8, min_len=100)
    cross = X.dup_spans(docs, **kw).collect()
    assert cross == []  # nothing duplicated ACROSS documents
    within = X.dup_spans(docs, within_doc=True, **kw).collect()
    by_doc = {}
    for r in within:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 2 not in by_doc          # unique doc stays clean
    assert len(by_doc[1]) == 2      # both copies flagged
    t = doc1.lower().strip()
    first, second = t.find(boiler), t.rfind(boiler)
    slop = (20 + 8) + (20 + 8 - 1)
    spans = sorted((r["span_start"], r["span_end"]) for r in by_doc[1])
    assert abs(spans[0][0] - first) <= slop and abs(spans[1][0] - second) <= slop


def test_vocab_top_k_counts_and_ties(spark):
    docs = spark.createDataFrame(
        [(1, "b a a B"), (2, "  c b A "), (3, "")],
        "doc_id long, text string",
    )
    got = [(r["token"], r["cnt"], r["rank"])
           for r in X.vocab_top_k(docs, n=2).orderBy("rank").collect()]
    # lowercased counts: a=3, b=3, c=1 -> tie a/b broken by token asc
    assert got == [("a", 3, 1), ("b", 3, 2)]
    full = {r["token"]: r["cnt"] for r in X.vocab_top_k(docs, n=10).collect()}
    assert full == {"a": 3, "b": 3, "c": 1}
    assert X.vocab_top_k(docs, n=10, min_count=2).count() == 2


@pytest.mark.parametrize("seed", [3, 11])
def test_remove_spans_randomized_matches_python_fold(spark, seed):
    """Randomized spans (overlapping, adjacent, nested, out-of-order) —
    the Catalyst fold must equal a direct Python excision with the same
    running-cursor rule on the normalized text."""
    rng = np.random.default_rng(seed)
    docs_rows, span_rows = [], []
    texts = {}
    for d in range(8):
        n = int(rng.integers(30, 120))
        txt = "".join(rng.choice(list("abcdef XY"), size=n))
        docs_rows.append((d, txt))
        texts[d] = txt.strip(" ").lower()
        for _ in range(int(rng.integers(0, 5))):
            s0 = int(rng.integers(0, max(1, len(texts[d]))))
            e0 = s0 + int(rng.integers(0, 20))
            span_rows.append((d, s0, min(e0, len(texts[d]))))
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    spans = spark.createDataFrame(
        span_rows or [(999, 0, 0)], "doc_id long, span_start long, span_end long"
    )
    got = {r["doc_id"]: r["clean_text"]
           for r in X.remove_spans(docs, spans).collect()}

    def excise(t, sp):
        pos, out = 0, []
        for s0, e0 in sorted(sp):
            if s0 > pos:
                out.append(t[pos:s0])
            pos = max(pos, e0)
        out.append(t[pos:])
        return "".join(out)

    for d, t in texts.items():
        sp = [(s0, e0) for dd, s0, e0 in span_rows if dd == d]
        assert got[d] == excise(t, sp), (seed, d, sp)


def test_ivf_precomputed_centroids_match_inline_training(emb):
    """VERDICT r4 task 7: train once via train_ivf_centroids, reuse via
    centroids= — results identical to inline training (same deterministic
    quantizer), no per-call corpus scan; a cell-count mismatch raises."""
    import pytest

    inline = S.ivf_ann_topk(emb, emb.limit(3), k=5, n_lists=8, n_probe=3)
    cents = S.train_ivf_centroids(emb, n_lists=8)
    assert len(cents) == 8 and len(cents[0]) == 64
    reused = S.ivf_ann_topk(
        emb, emb.limit(3), k=5, n_lists=8, n_probe=3, centroids=cents
    )
    a = sorted(map(tuple, inline.collect()))
    b = sorted(map(tuple, reused.collect()))
    assert a == b
    with pytest.raises(ValueError, match="n_lists"):
        S.ivf_ann_topk(emb, emb.limit(3), n_lists=4, centroids=cents)


def test_line_dedup_c4_semantics(spark):
    """Corpus-wide line dedup: duplicate lines keep only the globally
    smallest (doc_id, line_idx) occurrence; unique and blank lines pass
    through; order and trailing newlines preserved; a doc can dedup
    against ITSELF (repeated boilerplate)."""
    rows = [
        (1, "keep me\nSHARED\nunique one"),
        (2, "SHARED\nunique two\n\nSHARED"),
        (3, "unique three\nSHARED\n"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["clean_text"] for r in X.line_dedup(docs).collect()}
    # doc 1 holds the canonical SHARED (smallest doc_id)
    assert got[1] == "keep me\nSHARED\nunique one"
    # doc 2 loses both SHARED occurrences (cross-doc AND within-doc),
    # blank separator line survives
    assert got[2] == "unique two\n"
    # doc 3 loses SHARED, keeps its trailing empty line
    assert got[3] == "unique three\n"
    # doc made entirely of duplicates collapses to empty
    docs2 = spark.createDataFrame(
        [(1, "A\nB"), (2, "A\nB")], "doc_id long, text string"
    )
    got2 = {r["doc_id"]: r["clean_text"] for r in X.line_dedup(docs2).collect()}
    assert got2 == {1: "A\nB", 2: ""}


def test_kmeans_fit_matches_numpy_schedule(emb):
    """Distributed Lloyd == the NumPy replay of the exact schedule:
    identical rounded centroids every round and identical assignments
    (the per-round 6 dp centroid rounding is what pins the trajectory
    across engines/summation orders)."""
    import numpy as np

    cents = S.kmeans_fit(emb, k=6, iters=4, seed=42)
    got = {r["cid"]: (list(r["centroid"]), r["n_members"])
           for r in cents.collect()}
    pdf = emb.orderBy("vec_id").toPandas()
    ids = list(pdf["vec_id"])
    X = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    C, assign = S.kmeans_schedule_numpy(ids, X, k=6, iters=4, seed=42)
    assert set(got) == set(range(6))
    for j in range(6):
        assert got[j][0] == [round(float(x), 6) for x in C[j]], j
        assert got[j][1] == int((assign == j).sum()), j
    # assignment operator agrees row-for-row (argmin under the FINAL
    # centroids — one step past the loop's last pre-update assignment)
    final = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    arows = {r["id"]: r["cid"] for r in S.kmeans_assign(emb, cents).collect()}
    for i, vid in enumerate(ids):
        assert arows[vid] == int(final[i]), vid


def test_semantic_dedup_groups_and_centroid_reuse(spark):
    """SemDeDup on planted near-copy groups: exactly the min id per group
    plus every singleton survives; precomputed centroids reproduce the
    trained run; the cluster-size cap excludes over-full clusters
    (nothing from them dedups, all their rows survive)."""
    import random

    from nido_spark import similarity as S

    random.seed(3)
    rows, vid = [], 0
    base = {g: [random.gauss(0, 1) for _ in range(8)] for g in range(3)}
    for g in range(3):
        for _ in range(4):
            rows.append(
                (vid, [x + random.gauss(0, 0.001) for x in base[g]])
            )
            vid += 1
    for _ in range(5):
        rows.append((vid, [random.gauss(0, 1) for _ in range(8)]))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exp = [0, 4, 8, 12, 13, 14, 15, 16]  # min id per group + singletons
    got = sorted(
        r["vec_id"]
        for r in S.semantic_dedup(df, k=4, tau=0.99, iters=4, seed=1).collect()
    )
    assert got == exp
    # precomputed centroids (train-once discipline) == trained run
    cents = S.kmeans_fit(df, k=4, iters=4, seed=1)
    got2 = sorted(
        r["vec_id"]
        for r in S.semantic_dedup(
            df, tau=0.99, centroids=cents
        ).collect()
    )
    assert got2 == exp
    # cap: k=1 puts everything in one 17-row cluster; cap 10 excludes it,
    # so no pairs form and every row survives
    all_ids = sorted(r[0] for r in rows)
    capped = sorted(
        r["vec_id"]
        for r in S.semantic_dedup(
            df, k=1, tau=0.99, iters=2, seed=1, max_cluster_size=10
        ).collect()
    )
    assert capped == all_ids


def test_bm25_matches_hand_computation(spark):
    """BM25 scores == a direct Python evaluation of the Okapi formula
    (Lucene idf) on a tiny corpus; no-hit docs score 0/n_hit 0; ranking
    favors the doc with the rarer term."""
    import math

    rows = [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "durian durian durian apple"),
        (4, "elderberry"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["score"], r["n_hit"])
           for r in X.bm25_scores(docs, ["apple", "cherry"]).collect()}
    corpus = {d: t.split() for d, t in rows}
    n = len(corpus)
    avgdl = sum(len(t) for t in corpus.values()) / n
    k1, b = 1.2, 0.75

    def score(d, terms):
        s, hits = 0.0, 0
        for t in terms:
            tf = corpus[d].count(t)
            if tf == 0:
                continue
            df = sum(1 for dd in corpus.values() if t in dd)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(corpus[d]) / avgdl))
            hits += 1
        return s, hits

    for d in corpus:
        ws, wh = score(d, ["apple", "cherry"])
        assert abs(got[d][0] - ws) < 1e-9, d
        assert got[d][1] == wh, d
    assert got[4] == (0.0, 0)
    # cherry is rarer than apple: doc 2 (one cherry) outranks doc 1
    # (two apples) despite lower tf
    assert got[2][0] > got[1][0]


def test_unigram_logloss_hand_computed(spark):
    """Tiny corpus, model recomputed by hand: p(t) = (c+0.5)/(N+0.5V);
    xent = -(1/n) sum log2 p. Repetitive docs score strictly lower."""
    import math

    from nido_spark.textops import unigram_logloss

    docs = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d"), (3, "   "), (4, "b b a")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in unigram_logloss(docs).collect()}
    # corpus tokens: a x6, b x3, c x1, d x1 -> N=11, V=4, denom=13
    p = {t: (c + 0.5) / 13.0 for t, c in {"a": 6, "b": 3, "c": 1, "d": 1}.items()}
    want1 = -sum(math.log2(p["a"]) for _ in range(4)) / 4
    want2 = -(math.log2(p["a"]) + math.log2(p["b"]) + math.log2(p["c"]) + math.log2(p["d"])) / 4
    want4 = -(2 * math.log2(p["b"]) + math.log2(p["a"])) / 3
    assert 3 not in rows  # blank doc dropped
    assert rows[1]["n_tokens"] == 4 and abs(rows[1]["xent_bits"] - want1) < 1e-9
    assert rows[2]["n_tokens"] == 4 and abs(rows[2]["xent_bits"] - want2) < 1e-9
    assert rows[4]["n_tokens"] == 3 and abs(rows[4]["xent_bits"] - want4) < 1e-9
    # the all-common-token doc is "easier" than the diverse one
    assert rows[1]["xent_bits"] < rows[2]["xent_bits"]


def test_unigram_logloss_empty_corpus(spark):
    from nido_spark.textops import unigram_logloss

    docs = spark.createDataFrame([(1, "  "), (2, "")], "doc_id long, text string")
    assert unigram_logloss(docs).count() == 0


def test_tfidf_keywords_hand_computed(spark):
    """tf-idf with hand-checkable counts: df from doc-level presence,
    score = tf*ln(N/df) rounded to 9 dp BEFORE ranking, token-asc ties."""
    import math

    from nido_spark.textops import tfidf_keywords

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana common"),
            (2, "banana cherry common"),
            (3, "common cherry cherry date"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_keywords(docs, top_k=2)
    rows = {(r["doc_id"], r["rank"]): r for r in out.collect()}
    n = 3.0
    # doc 1: apple tf2 df1 -> 2ln3; banana tf1 df2 -> ln1.5; common score 0
    r = rows[(1, 1)]
    assert r["token"] == "apple" and r["tf"] == 2 and r["df"] == 1
    assert abs(r["score"] - round(2 * math.log(n / 1), 9)) < 1e-12
    assert rows[(1, 2)]["token"] == "banana"
    # doc 2: banana and cherry both tf1 df2 -> equal scores, token asc
    assert rows[(2, 1)]["token"] == "banana"
    assert rows[(2, 2)]["token"] == "cherry"
    # doc 3: cherry tf2 df2 beats date tf1 df1 iff 2ln(1.5) < ln(3): it is
    assert rows[(3, 1)]["token"] == "date"
    assert rows[(3, 2)]["token"] == "cherry"
    # ubiquitous token never ranks while distinctive ones exist
    assert all(r["token"] != "common" for r in rows.values())


def test_chunk_documents_windows_and_tail(spark):
    """Coverage + overlap semantics: stride windows, short tail kept,
    one chunk for docs shorter than chunk_tokens (even <= overlap),
    blank docs dropped, chunks reassemble the token stream."""
    import pytest as _pytest

    from nido_spark.textops import chunk_documents

    toks = [f"t{i}" for i in range(11)]
    docs = spark.createDataFrame(
        [(1, " ".join(toks)), (2, "a b"), (3, "x"), (4, "   ")],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=5, overlap=2)
    rows = {(r["doc_id"], r["chunk_idx"]): r for r in out.collect()}
    # doc 1: 11 tokens, stride 3 -> nchunks = floor((11-2-1)/3)+1 = 3
    assert {i for d, i in rows if d == 1} == {0, 1, 2}
    assert rows[(1, 0)]["chunk_text"] == "t0 t1 t2 t3 t4"
    assert rows[(1, 1)]["chunk_text"] == "t3 t4 t5 t6 t7"
    assert rows[(1, 2)]["chunk_text"] == "t6 t7 t8 t9 t10"
    assert rows[(1, 2)]["n_tokens"] == 5
    # doc 2 (2 tokens <= overlap): exactly ONE chunk, the whole doc
    assert {i for d, i in rows if d == 2} == {0}
    assert rows[(2, 0)]["chunk_text"] == "a b" and rows[(2, 0)]["n_tokens"] == 2
    assert rows[(3, 0)]["chunk_text"] == "x"
    assert all(d != 4 for d, _ in rows)  # blank dropped
    # no-overlap path reassembles the exact token stream
    out0 = chunk_documents(docs.where(F.col("doc_id") == 1), chunk_tokens=4)
    parts = sorted(
        ((r["chunk_idx"], r["chunk_text"]) for r in out0.collect())
    )
    assert " ".join(p for _, p in parts) == " ".join(toks)
    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_bigram_logloss_hand_computed(spark):
    """Tiny corpus, bigram model recomputed by hand: p(w2|w1) =
    (c2+0.5)/(c1(w1)+0.5V). Order sensitivity: a doc whose bigrams are
    corpus-frequent scores lower than the same tokens reordered."""
    import math

    from nido_spark.textops import bigram_logloss

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "b a b a"), (3, "a"), (4, "a b c")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in bigram_logloss(docs).collect()}
    # unigrams (doc 3's lone 'a' counts too): a x6, b x5, c x1 -> V=3
    # bigrams:  (a,b) x4  [doc1 x2, doc2 x1, doc4 x1]
    #           (b,a) x3  [doc1 x1, doc2 x2]
    #           (b,c) x1  [doc4]
    cu = {"a": 6, "b": 5, "c": 1}
    cb = {("a", "b"): 4, ("b", "a"): 3, ("b", "c"): 1}

    def lp(w1, w2):
        return math.log2((cb[(w1, w2)] + 0.5) / (cu[w1] + 0.5 * 3))

    want1 = -(2 * lp("a", "b") + lp("b", "a")) / 3
    want2 = -(lp("b", "a") + lp("a", "b") + lp("b", "a")) / 3
    want4 = -(lp("a", "b") + lp("b", "c")) / 2
    assert 3 not in rows  # single-token doc has no bigrams
    assert rows[1]["n_bigrams"] == 3 and abs(rows[1]["xent_bits"] - want1) < 1e-9
    assert rows[2]["n_bigrams"] == 3 and abs(rows[2]["xent_bits"] - want2) < 1e-9
    assert rows[4]["n_bigrams"] == 2 and abs(rows[4]["xent_bits"] - want4) < 1e-9
    # (b,c) is the rare bigram: doc 4 is the hardest
    assert rows[4]["xent_bits"] > rows[1]["xent_bits"]


def test_bigram_logloss_empty_corpus(spark):
    from nido_spark.textops import bigram_logloss

    docs = spark.createDataFrame(
        [(1, "solo"), (2, "  ")], "doc_id long, text string"
    )
    # one-token and blank docs produce no bigrams; vocab nonzero path
    assert bigram_logloss(docs).count() == 0


def test_exact_quantiles_percentile_disc_semantics(spark):
    """q(p) = smallest value whose cumulative count >= ceil(p*n) — the
    PERCENTILE_DISC contract, pinned on a hand-computed fixture with
    ties and gaps (values 1,1,2,5,5,5,9; n=7)."""
    from nido_spark.textops import exact_quantiles

    df = spark.createDataFrame([(v,) for v in [1, 1, 2, 5, 5, 5, 9]], "x long")
    got = {
        r["p"]: r["q"]
        for r in exact_quantiles(df, "x", [0.0, 0.25, 0.5, 0.9, 1.0]).collect()
    }
    # ranks: 0 -> min, 1.75->2 -> 1, 3.5->4 -> 5, 6.3->7 -> 9, 7 -> 9
    assert got == {0.0: 1, 0.25: 1, 0.5: 5, 0.9: 9, 1.0: 9}


def test_exact_quantiles_float_rank_regression(spark):
    """p*n representation error must not shift the rank: 0.07*100 is
    7.000000000000001 in doubles — ceil-based ranking returned 8; the
    cume_dist comparison returns PERCENTILE_DISC's 7 (review finding)."""
    from nido_spark.textops import exact_quantiles

    df = spark.createDataFrame([(v,) for v in range(1, 101)], "x long")
    got = {r["p"]: r["q"] for r in exact_quantiles(df, "x", [0.07, 0.29, 0.93]).collect()}
    assert got == {0.07: 7, 0.29: 29, 0.93: 93}


def test_exact_quantiles_matches_duckdb_percentile_disc(spark):
    """Algorithm-independent cross-check on the real corpus fixture."""
    import duckdb

    from nido_spark.textops import exact_quantiles, token_count

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tc = token_count(docs)
    probs = [0.1, 0.5, 0.9]
    got = {r["p"]: r["q"] for r in exact_quantiles(tc, "n_tokens", probs).collect()}
    pdf = tc.toPandas()
    con = duckdb.connect()
    con.register("tc", pdf)
    for p in probs:
        want = con.execute(
            f"SELECT percentile_disc({p}) WITHIN GROUP (ORDER BY n_tokens) FROM tc"
        ).fetchone()[0]
        assert got[p] == want, (p, got[p], want)


def test_sample_weighted_exact_race_replay(spark):
    """Winners are exactly the k smallest ROUND(-ln(u)/w, 9) keys with
    (key, id) tie order — pure-Python replay of the same portable hash;
    and a dominant weight (1e9 vs 1-100) must win a slot."""
    import math

    from nido_spark.pipeline import (
        _SAMPLE_A1, _SAMPLE_A2, _SAMPLE_B1, _SAMPLE_B2, _SAMPLE_P, _SAMPLE_P2,
        sample_weighted,
    )

    rows = [(i, float(1 + (i * 37) % 100)) for i in range(200)] + [(999, 1e9)]
    df = spark.createDataFrame(rows, "doc_id long, wt double")
    got = sorted(r["doc_id"] for r in sample_weighted(df, "wt", k=20, seed=7).collect())

    def bucket(v, seed):
        r1 = (_SAMPLE_A1 * ((v % _SAMPLE_P) + seed) + _SAMPLE_B1) % _SAMPLE_P
        return (_SAMPLE_A2 * (r1 % (1 << 30)) + _SAMPLE_B2) % _SAMPLE_P2

    keyed = [
        (round(-math.log((bucket(i, 7) + 1) / float(_SAMPLE_P2 + 1)) / w, 9), i)
        for i, w in rows
    ]
    want = sorted(i for _, i in sorted(keyed)[:20])
    assert got == want
    assert 999 in got


def test_containment_catches_what_jaccard_misses(spark):
    """A short doc quoted wholesale inside a much longer one: containment
    of the short side ~1 (caught at threshold 0.8) while exact Jaccard is
    far below 0.7 (minhash_dedup's verify would drop the pair) — the
    asymmetric case this operator exists for. Counts cross-checked in
    pure Python on the same shingle sets."""
    import numpy as np

    rng = np.random.default_rng(7)
    letters = "abcdefghijklmnopqrstuvwxyz "
    quote = "".join(rng.choice(list(letters), 60))
    filler = "".join(rng.choice(list(letters), 1500))
    docs = spark.createDataFrame(
        [(1, quote), (2, filler[:700] + quote + filler[700:]), (3, filler[:300])],
        "doc_id long, text string",
    )
    out = {(r["a"], r["b"]): r for r in D.containment_pairs(docs, k=5, threshold=0.8).collect()}
    assert (1, 2) in out
    row = out[(1, 2)]

    def shingles(t):
        t = t.lower().strip()
        return {t[i : i + 5] for i in range(len(t) - 4)}

    s1, s2 = shingles(quote), shingles(filler[:700] + quote + filler[700:])
    assert row["common"] == len(s1 & s2)
    assert abs(row["c_ab"] - len(s1 & s2) / len(s1)) < 1e-12
    assert row["c_ab"] > 0.9
    jac = len(s1 & s2) / len(s1 | s2)
    assert jac < 0.2  # Jaccard-threshold dedup would never keep this pair


def test_containment_cap_bounds_candidates_not_values(spark):
    """Shingles above the df cap are excluded from candidate generation
    but must NOT be excluded from the verified counts: docs sharing a
    ubiquitous template plus a rare quote report the TRUE containment
    (template included), not the rare-only fraction (review finding)."""
    import numpy as np

    rng = np.random.default_rng(3)
    letters = "abcdefghijklmnopqrstuvwxyz "
    template = "".join(rng.choice(list(letters), 400))
    quote = "".join(rng.choice(list(letters), 80))
    rows = [(i, template) for i in range(10, 20)]  # df(template shingles) = 12 > cap
    rows.append((1, template + quote))
    rows.append((2, template + quote + "".join(rng.choice(list(letters), 50))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["a"], r["b"]): r
        for r in D.containment_pairs(
            docs, k=5, threshold=0.8, min_common=3, max_docs_per_shingle=5
        ).collect()
    }
    # candidates for (1,2) exist via the rare quote shingles; the verified
    # containment counts the template too -> c_ab ~ 1 despite the cap
    assert (1, 2) in out
    assert out[(1, 2)]["c_ab"] > 0.95
    # template-only pairs share NO rare shingle: below min_common, invisible
    assert not any(a >= 10 and b >= 10 for a, b in out)


def test_sample_k_per_stratum_exact_counts_and_determinism(spark):
    """Exactly min(k, stratum size) per class; winners = the k smallest
    portable-hash draws (Python replay); identical under repartitioning."""
    from nido_spark.pipeline import (
        _SAMPLE_A1, _SAMPLE_A2, _SAMPLE_B1, _SAMPLE_B2, _SAMPLE_P, _SAMPLE_P2,
        sample_k_per_stratum,
    )

    rows = [(i, "en" if i % 3 else "de") for i in range(60)] + [(100, "fr")]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = sample_k_per_stratum(df, k=5, strata_col="lang", seed=7).collect()
    by = {}
    for r in got:
        by.setdefault(r["lang"], []).append(r["doc_id"])
    assert len(by["en"]) == 5 and len(by["de"]) == 5
    assert by["fr"] == [100]  # stratum smaller than k: keep all

    def bucket(v, seed):
        r1 = (_SAMPLE_A1 * ((v % _SAMPLE_P) + seed) + _SAMPLE_B1) % _SAMPLE_P
        return (_SAMPLE_A2 * (r1 % (1 << 30)) + _SAMPLE_B2) % _SAMPLE_P2

    for lang in ("en", "de"):
        ids = [i for i, lg in rows if lg == lang]
        want = sorted(ids, key=lambda i: (bucket(i, 7), i))[:5]
        assert sorted(by[lang]) == sorted(want)
    again = sample_k_per_stratum(df.repartition(11), k=5, strata_col="lang", seed=7).collect()
    assert {(r["doc_id"], r["lang"]) for r in again} == {
        (r["doc_id"], r["lang"]) for r in got
    }


def test_textrank_keywords_python_replay_and_invariants(spark):
    """Spark TextRank == a pure-Python replay of the exact fixed schedule
    (adjacency pairs -> out-fraction PageRank, 8 rounds) on docs with
    repeats, hubs, and case folding; per-doc scores sum to 1 (stochastic
    flow + (1-d)/N base keeps total mass 1 every round); edgeless docs
    (single token / all-identical tokens) emit nothing."""
    from nido_spark.textops import textrank_keywords

    docs = spark.createDataFrame(
        [
            (1, "a b a b c"),
            (2, "Spark spark RANK rank spark graph rank"),
            (3, "x x x"),
            (4, "solo"),
            (5, "hub a hub b hub c hub d"),
        ],
        "doc_id long, text string",
    )
    got: dict[tuple[int, str], float] = {}
    ranks: dict[tuple[int, int], str] = {}
    for r in textrank_keywords(docs, top_k=1_000_000, n_iters=8).collect():
        got[(r["doc_id"], r["token"])] = r["score"]
        ranks[(r["doc_id"], r["rank"])] = r["token"]
    assert not any(d in (3, 4) for d, _ in got)

    d = 0.85
    for doc_id, text in [(1, "a b a b c"), (2, "spark spark rank rank spark graph rank"), (5, "hub a hub b hub c hub d")]:
        toks = text.lower().split()
        w: dict[tuple[str, str], float] = {}
        for x, y in zip(toks, toks[1:]):
            if x != y:
                k = (min(x, y), max(x, y))
                w[k] = w.get(k, 0.0) + 1.0
        nbrs: dict[str, dict[str, float]] = {}
        for (a, b), c in w.items():
            nbrs.setdefault(a, {})[b] = c
            nbrs.setdefault(b, {})[a] = c
        n = len(nbrs)
        r = {v: 1.0 / n for v in nbrs}
        for _ in range(8):
            r = {
                v: (1 - d) / n
                + d * sum(w_uv / sum(nbrs[u].values()) * r[u]
                          for u, w_uv in nbrs[v].items())
                for v in nbrs
            }
        for v in nbrs:
            assert abs(got[(doc_id, v)] - r[v]) < 1e-9, (doc_id, v)
        assert abs(sum(got[(doc_id, v)] for v in nbrs) - 1.0) < 1e-6
    # doc 5: the hub token carries the most flow and ranks first
    assert ranks[(5, 1)] == "hub"


def test_pca_power_matches_numpy_and_eigh(spark):
    """pca_project == a NumPy replay of the pinned fixed schedule (all-ones
    start, 9 dp mean/direction rounding, centered two-pass product) to
    well under the rounding quantum's propagation; and on an anisotropic
    cloud the learned axis aligns with numpy.linalg.eigh's top covariance
    eigenvector (|cos| > 0.999). Precomputed (component, mean) reuse skips
    training and reproduces the same projections exactly."""
    import numpy as np

    from nido_spark.similarity import pca_power, pca_project

    rng = np.random.default_rng(7)
    # dominant axis along a fixed direction, plus small isotropic noise
    axis = np.array([3.0, 1.0, -2.0, 0.5])
    axis /= np.linalg.norm(axis)
    pts = (
        rng.normal(0, 4.0, size=(200, 1)) * axis
        + rng.normal(0, 0.3, size=(200, 4))
        + np.array([1.0, -2.0, 0.5, 3.0])
    )
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(pts)],
        "vec_id long, embedding array<double>",
    )
    comp, mean = pca_power(vecs, n_iters=6)
    got = {r["vec_id"]: r["proj"] for r in pca_project(
        vecs, component=comp, mean=mean
    ).collect()}

    # NumPy replay of the exact schedule
    X = pts
    m = np.round(X.mean(axis=0), 9)
    r = np.ones(4)
    for _ in range(6):
        s = X @ r - float(m @ r)
        u = X.T @ s - m * s.sum()
        r = np.round(u / np.sqrt((u * u).sum()), 9)
    want = np.round(X @ r - float(m @ r), 9)
    assert np.allclose(comp, r, atol=1e-8)
    for i in range(len(X)):
        assert abs(got[i] - want[i]) < 1e-6, i

    cov_eigvals, cov_eigvecs = np.linalg.eigh(np.cov((X - X.mean(0)).T))
    top = cov_eigvecs[:, -1]
    assert abs(float(np.dot(comp, top))) > 0.999

    # training inside pca_project gives the same result as the reuse path
    retrained = {r["vec_id"]: r["proj"] for r in pca_project(
        vecs, n_iters=6
    ).collect()}
    assert retrained == got


def test_collocations_llr_python_replay(spark):
    """G2 == a pure-Python contingency replay on a corpus with a planted
    collocation: 'new york' (always together) scores far above 'the end'
    (frequent but independent); zero cells contribute 0; min_count prunes
    the hapax tail."""
    import math

    from nido_spark.textops import collocations_llr

    rows = []
    for i in range(30):
        rows.append((i, "we visited new york in the spring"))
    for i in range(30, 60):
        rows.append((i, "the end of the story was the best part"))
    rows.append((60, "rare bigram"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["w1"], r["w2"]): (r["n"], r["g2"])
        for r in collocations_llr(docs, min_count=5).collect()
    }
    assert ("rare", "bigram") not in got  # min_count prune

    # pure-Python replay
    c12: dict[tuple[str, str], int] = {}
    for _, text in rows:
        toks = text.lower().split()
        for a, b in zip(toks, toks[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
    c1: dict[str, int] = {}
    c2: dict[str, int] = {}
    for (a, b), n in c12.items():
        c1[a] = c1.get(a, 0) + n
        c2[b] = c2.get(b, 0) + n
    nn = float(sum(c12.values()))

    def g2(a, b):
        k11 = float(c12[(a, b)])
        k12 = c1[a] - k11
        k21 = c2[b] - k11
        k22 = nn - c1[a] - c2[b] + k11
        tot = 0.0
        for k, e in [
            (k11, (k11 + k12) * (k11 + k21) / nn),
            (k12, (k11 + k12) * (k12 + k22) / nn),
            (k21, (k21 + k22) * (k11 + k21) / nn),
            (k22, (k21 + k22) * (k12 + k22) / nn),
        ]:
            if k > 0:
                tot += k * math.log(k / e)
        return 2.0 * tot

    for (a, b), (n, got_g2) in got.items():
        assert n == c12[(a, b)]
        assert abs(got_g2 - g2(a, b)) < 1e-7, (a, b)
    assert got[("new", "york")][1] > got[("the", "end")][1]


def test_silhouette_centroid_hand_values_and_replay(spark):
    """Hand-checkable geometry: s = (b-a)/max(a,b) with a/b the nearest /
    second-nearest centroid distances; on-centroid vector scores 1,
    midpoint scores 0, ties assign to the smaller cid; k < 2 raises.
    Random cloud: == NumPy replay over kmeans_fit centroids."""
    import numpy as np
    import pytest as _pt

    from nido_spark.similarity import kmeans_fit, silhouette_centroid

    cents = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 0.0])],
        "cid int, centroid array<double>",
    )
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [5.0, 0.0]), (3, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["id"]: (r["cid"], r["s"])
        for r in silhouette_centroid(vecs, cents).collect()
    }
    assert got[1] == (0, round(8.0 / 9.0, 9))
    assert got[2] == (0, 0.0)  # midpoint: tie -> smaller cid, s = 0
    assert got[3] == (0, 1.0)

    with _pt.raises(ValueError):
        silhouette_centroid(vecs, cents.where("cid = 0"))

    rng = np.random.default_rng(11)
    pts = np.vstack(
        [rng.normal(c, 0.5, size=(40, 3)) for c in ([0, 0, 0], [5, 5, 5], [9, 0, 9])]
    )
    vdf = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(pts)],
        "vec_id long, embedding array<double>",
    )
    cdf = kmeans_fit(vdf, k=3, iters=4, seed=42)
    got = {
        r["id"]: (r["cid"], r["s"])
        for r in silhouette_centroid(vdf, cdf).collect()
    }
    C = np.array(
        [r["centroid"] for r in cdf.orderBy("cid").collect()], dtype=np.float64
    )
    d = np.sqrt(((pts[:, None, :] - C[None, :, :]) ** 2).sum(-1))
    order = np.argsort(d + np.arange(len(C)) * 1e-15, axis=1)  # ties -> lower cid
    for i in range(len(pts)):
        own, nxt = order[i, 0], order[i, 1]
        a, b = d[i, own], d[i, nxt]
        s = 0.0 if max(a, b) == 0 else (b - a) / max(a, b)
        assert got[i][0] == own
        assert abs(got[i][1] - s) < 1e-7, i
    # well-separated clusters: mean silhouette is high
    assert np.mean([s for _, s in got.values()]) > 0.7


def test_readability_hand_values(spark):
    """Boundary-run sentence counting ('?!' is ONE boundary), trailing
    fragment adds a sentence, letters-only chars/word, FRE proxy; blank
    docs -> zero counts and NULL ratios."""
    from nido_spark.textops import readability

    docs = spark.createDataFrame(
        [
            (1, "Hello world. How are you?! ok"),
            (2, "No terminal punctuation here"),
            (3, "Done."),
            (4, "   "),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in readability(docs).collect()}
    r = got[1]
    assert (r["n_sents"], r["n_words"]) == (3, 6)
    assert r["words_per_sent"] == 2.0
    assert r["chars_per_word"] == 3.5
    assert abs(r["fre"] - round(206.835 - 1.015 * 2.0 - 84.6 * (3.5 / 3.0), 9)) < 1e-9
    assert (got[2]["n_sents"], got[2]["n_words"]) == (1, 4)
    assert (got[3]["n_sents"], got[3]["n_words"]) == (1, 1)
    assert got[4]["n_sents"] == 0 and got[4]["n_words"] == 0
    assert got[4]["words_per_sent"] is None and got[4]["fre"] is None


def test_quantize_dequantize_roundtrip_and_bounds(spark):
    """q in [-127, 127], endpoints reconstruct exactly, every cell
    reconstructs within half a quantization level, constant vectors
    quantize to all-zero with mn == mx, and the pure-Python replay of
    the formula matches cell for cell."""
    import numpy as np

    from nido_spark.similarity import dequantize_embeddings, quantize_embeddings

    rng = np.random.default_rng(3)
    pts = rng.normal(0, 2, size=(50, 16))
    rows = [(i, [float(x) for x in r]) for i, r in enumerate(pts)]
    rows.append((99, [5.0] * 16))  # constant vector
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qd = quantize_embeddings(vecs)
    got = {r["id"]: (r["mn"], r["mx"], r["qvec"]) for r in qd.collect()}
    de = {r["id"]: r["embedding"] for r in dequantize_embeddings(qd).collect()}

    assert got[99][0] == got[99][1] == 5.0
    assert got[99][2] == [0] * 16
    for i, row in enumerate(pts):
        mn, mx, q = got[i]
        assert mn == row.min() and mx == row.max()
        s = mx - mn
        level = s / 254.0
        for j, x in enumerate(row):
            want_q = int(np.floor((x - mn) / s * 254.0 + 0.5)) - 127
            assert q[j] == want_q, (i, j)
            assert -127 <= q[j] <= 127
            assert abs(de[i][j] - x) <= level / 2 + 1e-12
        # range endpoints are exact
        jmin, jmax = int(row.argmin()), int(row.argmax())
        assert abs(de[i][jmin] - mn) < 1e-12 and abs(de[i][jmax] - mx) < 1e-12


# ---------------------------------------------------------------------------
# char_entropy
# ---------------------------------------------------------------------------


def test_char_entropy_pure_python_replay(spark):
    import math
    from collections import Counter

    from nido_spark.textops import char_entropy

    texts = {
        1: "aaaa",                      # H = 0
        2: "abab",                      # H = 1
        3: "the quick brown fox jumps", # natural-ish
        4: "",                          # empty -> NULL entropy
        5: None,                        # NULL text -> NULL entropy
        6: "abcd",                      # H = 2
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {r["doc_id"]: r for r in char_entropy(df).collect()}
    assert set(got) == set(texts)
    for d, t in texts.items():
        if not t:
            assert got[d]["n_chars"] == 0 and got[d]["entropy_bits"] is None
            continue
        c = Counter(t)
        n = len(t)
        want = round(math.log2(n) - sum(v * math.log2(v) for v in c.values()) / n, 9)
        assert got[d]["n_chars"] == n
        assert got[d]["n_distinct_chars"] == len(c)
        assert abs(got[d]["entropy_bits"] - want) <= 1e-9, (d, got[d], want)
    assert got[1]["entropy_bits"] == 0.0
    assert got[2]["entropy_bits"] == 1.0
    assert got[6]["entropy_bits"] == 2.0


# ---------------------------------------------------------------------------
# random_projection (JL)
# ---------------------------------------------------------------------------


def test_random_projection_numpy_replay_and_distance_preservation(spark):
    import numpy as np

    from nido_spark.similarity import jl_sign_matrix, random_projection

    rng = np.random.default_rng(3)
    X = rng.normal(size=(200, 64)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: np.array(r["proj"]) for r in random_projection(df, dim=64).collect()}
    R = jl_sign_matrix(64, 16)
    want = (X.astype(np.float64) @ R) / 4.0
    for i in range(200):
        assert np.allclose(got[i], want[i], atol=1e-12), i
    # JL property: pairwise distances preserved within ~3*sqrt(ln n / d')
    pairs = [(0, 1), (5, 99), (42, 117), (150, 199)]
    eps = 3 * np.sqrt(np.log(200) / 16)
    for a, b in pairs:
        d0 = np.linalg.norm(X[a].astype(np.float64) - X[b].astype(np.float64))
        d1 = np.linalg.norm(want[a] - want[b])
        assert abs(d1 / d0 - 1) < eps, (a, b, d0, d1)


def test_random_projection_contracts(spark):
    import pytest as _pt

    from nido_spark.similarity import random_projection

    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0])], "vec_id long, embedding array<float>"
    )
    with _pt.raises(Exception, match="random_projection"):
        random_projection(df, dim=64).collect()
    with _pt.raises(ValueError):
        random_projection(df, dim=0)


def test_jl_sign_matrix_balanced_and_deterministic():
    import numpy as np

    from nido_spark.similarity import jl_sign_matrix

    R = jl_sign_matrix(64, 16, seed=42)
    assert set(np.unique(R)) == {-1.0, 1.0}
    # roughly balanced signs (binomial 3-sigma on 1024 entries)
    assert abs(R.mean()) < 3 / np.sqrt(1024)
    assert np.array_equal(R, jl_sign_matrix(64, 16, seed=42))
    assert not np.array_equal(R, jl_sign_matrix(64, 16, seed=43))


# ---------------------------------------------------------------------------
# knn_graph
# ---------------------------------------------------------------------------


def test_knn_graph_matches_per_query_lsh_and_bruteforce_recall(spark):
    import numpy as np

    from nido_spark.similarity import knn_graph, lsh_ann_topk

    rng = np.random.default_rng(7)
    # clustered vectors so LSH buckets are meaningful
    centers = rng.normal(size=(5, 32))
    X = np.vstack([c + 0.05 * rng.normal(size=(40, 32)) for c in centers])
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<float>",
    )
    g = knn_graph(df, k=3, n_bits=16, n_bands=8, dim=32).collect()
    got = {(r["src"], r["dst"], r["rank"]) for r in g}
    # per-query equality with lsh_ann_topk run over ALL ids as queries
    ref = lsh_ann_topk(df, df, k=3, n_bits=16, n_bands=8, dim=32).collect()
    want = {(r["query_id"], r["nbr_id"], r["rank"]) for r in ref}
    assert got == want
    # same-cluster recall: top-1 neighbor should share the source cluster
    top1 = {r["src"]: r["dst"] for r in g if r["rank"] == 1}
    same = sum(1 for s, d in top1.items() if s // 40 == d // 40)
    assert same / len(top1) > 0.95


def test_knn_graph_rank_contract_and_no_self(spark):
    from nido_spark.similarity import knn_graph

    df = spark.createDataFrame(
        [(i, [1.0, 0.0, float(i % 2)]) for i in range(8)],
        "vec_id long, embedding array<float>",
    )
    rows = knn_graph(df, k=2, n_bits=8, n_bands=8, dim=3).collect()
    assert all(r["src"] != r["dst"] for r in rows)
    by_src = {}
    for r in rows:
        by_src.setdefault(r["src"], []).append(r["rank"])
    for s, ranks in by_src.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), s


# ---------------------------------------------------------------------------
# mmr_select
# ---------------------------------------------------------------------------


def _py_mmr(X, q, k, lam):
    import numpy as np

    X = X.astype(np.float64)
    q = np.asarray(q, dtype=np.float64)

    def cos(a, b):
        return float(np.dot(a, b) / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-12))

    rel = [cos(x, q) for x in X]
    picked, out = [], []
    for r in range(1, k + 1):
        best = None
        for i in range(len(X)):
            if i in picked:
                continue
            red = max((cos(X[i], X[p]) for p in picked), default=0.0)
            s = lam * rel[i] - (1 - lam) * red
            key = (-s, i)
            if best is None or key < best[0]:
                best = (key, i, s)
        picked.append(best[1])
        out.append((r, best[1], best[2]))
    return out


def test_mmr_select_numpy_replay_and_diversity(spark):
    import numpy as np

    from nido_spark.similarity import mmr_select

    rng = np.random.default_rng(9)
    # three tight clusters: plain top-k would pick one cluster k times
    centers = rng.normal(size=(3, 16))
    X = np.vstack([c + 0.01 * rng.normal(size=(10, 16)) for c in centers])
    q = X[:30].mean(axis=0)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    Xd = np.array([np.asarray(X[i], dtype=np.float32) for i in range(30)])
    want = _py_mmr(Xd, q, k=3, lam=0.5)
    got = [
        (r["rank"], r["vec_id"], r["score"])
        for r in mmr_select(df, [float(v) for v in q], k=3, lam=0.5)
        .orderBy("rank")
        .collect()
    ]
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in want]
    for (_, _, s1), (_, _, s2) in zip(got, want):
        assert abs(s1 - s2) < 1e-9
    # diversity: the 3 picks land in 3 DIFFERENT clusters
    assert len({v // 10 for _, v, _ in got}) == 3


def test_mmr_select_contracts(spark):
    import pytest as _pt

    from nido_spark.similarity import mmr_select

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    with _pt.raises(ValueError):
        mmr_select(df, [1.0, 0.0], k=0)
    with _pt.raises(ValueError):
        mmr_select(df, [1.0, 0.0], lam=1.5)
    # k > n stops at n picks
    out = mmr_select(df, [1.0, 0.0], k=5, lam=1.0).collect()
    assert len(out) == 2


def _brute_jaccard_pairs(texts, k, t):
    """Exhaustive shingle-set Jaccard over a {doc_id: text} dict."""
    sets = {}
    for d, txt in texts.items():
        s = txt.strip().lower()
        sets[d] = {s[i : i + k] for i in range(max(len(s) - k + 1, 0))}
        sets[d] = {g for g in sets[d] if len(g) == k}
    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            u = sets[a] | sets[b]
            if not u:
                continue
            j = len(sets[a] & sets[b]) / len(u)
            if j >= t:
                out[(a, b)] = j
    return out


def test_jaccard_join_exact_recall_mid_band(spark):
    """EVERY pair at J >= t is returned, including the mid-band pairs
    (J in [0.3, 0.7)) that banded MinHash misses with material
    probability — the operator's reason to exist. Values match the
    brute-force Jaccard to 1e-9."""
    import random

    from nido_spark.dedup import jaccard_join

    rng = random.Random(19)
    base = ["the quick brown fox jumps over the lazy dog " * 3,
            "pack my box with five dozen liquor jugs " * 3,
            "how vexingly quick daft zebras jump " * 3]
    texts = {}
    did = 0
    for b in base:
        for _ in range(6):
            # random perturbation: drop / duplicate / mutate chunks, so
            # pair similarities spread across the whole (0, 1] range
            words = b.split()
            m = rng.randrange(0, len(words) // 2)
            for _ in range(m):
                op = rng.randrange(3)
                i = rng.randrange(len(words))
                if op == 0:
                    words[i] = words[i][::-1]
                elif op == 1:
                    words.insert(i, "w%d" % rng.randrange(50))
                else:
                    del words[i]
            texts[did] = " ".join(words)
            did += 1
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    for t in (0.35, 0.6):
        want = _brute_jaccard_pairs(texts, 5, t)
        got = {
            (r["a"], r["b"]): r["jaccard"]
            for r in jaccard_join(df, threshold=t).collect()
        }
        assert set(got) == set(want), f"t={t}: missing {set(want) - set(got)}"
        assert all(abs(got[p] - want[p]) < 1e-9 for p in want)
        assert any(0.3 <= j < 0.7 for j in want.values()) or t > 0.55, \
            "fixture must exercise the mid band"


def test_jaccard_join_threshold_one_and_validation(spark):
    import pytest as _pt

    from nido_spark.dedup import jaccard_join

    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "abcdefghij"), (3, "zzzzzzzzzz")],
        "doc_id long, text string",
    )
    got = {(r["a"], r["b"]) for r in jaccard_join(df, threshold=1.0).collect()}
    assert got == {(1, 2)}
    with _pt.raises(ValueError):
        jaccard_join(df, threshold=0.0)


def test_jaccard_join_staged_equals_lazy(spark):
    """Round-6 optimization pin: materialize_stages (the default, which
    truncates sets/prefix/candidates at their stage boundaries) returns
    exactly the fused lazy plan's pairs and values."""
    from nido_spark.dedup import jaccard_join

    rows = [
        (i, ("alpha beta gamma delta epsilon zeta " * 4) + f"tail {i % 4}")
        for i in range(24)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for t in (0.5, 0.8):
        staged = {
            (r["a"], r["b"]): r["jaccard"]
            for r in jaccard_join(df, threshold=t).collect()
        }
        lazy = {
            (r["a"], r["b"]): r["jaccard"]
            for r in jaccard_join(
                df, threshold=t, materialize_stages=False
            ).collect()
        }
        assert staged == lazy and len(staged) > 0


def _np_pq_reference(X, ids, cb, queries, k):
    """Pure-NumPy ADC replay with the engine's fold order and tie-breaks."""
    import numpy as np

    B = np.asarray(cb)
    m, nc, sub = B.shape
    codes = np.empty((len(X), m), dtype=int)
    for j in range(m):
        acc = np.zeros((len(X), nc))
        for d in range(sub):
            diff = X[:, j * sub + d][:, None] - B[j][:, d][None, :]
            acc += diff * diff
        codes[:, j] = acc.argmin(1)
    out = {}
    for q in queries:
        qi = list(ids).index(q)
        lut = np.zeros((m, nc))
        for j in range(m):
            a = np.zeros(nc)
            for d in range(sub):
                df_ = X[qi, j * sub + d] - B[j][:, d]
                a += df_ * df_
            lut[j] = a
        ad = [
            (float(sum(lut[j, codes[i, j]] for j in range(m))), int(ids[i]))
            for i in range(len(X))
            if ids[i] != q
        ]
        out[q] = [(nbr, round(d_, 6)) for d_, nbr in sorted(ad)[:k]]
    return out


def test_pq_ann_matches_numpy_replay_and_is_partition_invariant(spark):
    """Codes, ADC distances and ranks equal the driver-side NumPy replay
    (same fold order, same argmin tie-break) at ANY partitioning, and
    passing precomputed codebooks equals inline training."""
    import numpy as np

    from nido_spark import similarity as S

    rng = np.random.default_rng(5)
    X = rng.normal(size=(300, 32)).round(4)
    rows = [(i, [float(x) for x in X[i]]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = S.train_pq_codebooks(df, m=4, nbits=4, seed=11)
    want = _np_pq_reference(X, np.arange(300), cb, [0, 1], k=5)
    for nparts in (1, 7):
        out = S.pq_ann_topk(
            df.repartition(nparts), df.where("vec_id < 2"),
            k=5, m=4, nbits=4, seed=11,
        ).collect()
        got = {}
        for r in sorted(out, key=lambda r: (r["query_id"], r["rank"])):
            got.setdefault(r["query_id"], []).append((r["nbr_id"], r["adist"]))
        assert got == want, f"nparts={nparts}"
    # precomputed codebooks path == inline training
    out2 = S.pq_ann_topk(
        df, df.where("vec_id < 2"), k=5, codebooks=cb
    ).collect()
    got2 = {}
    for r in sorted(out2, key=lambda r: (r["query_id"], r["rank"])):
        got2.setdefault(r["query_id"], []).append((r["nbr_id"], r["adist"]))
    assert got2 == want


def test_pq_quantization_recall_against_exact(spark):
    """PQ is lossy but must stay USEFUL: on clustered data (where ANN is
    deployed) recall@5 vs exact L2 must clear a deterministic floor.
    Tight clusters are PQ's hard case for FINE ranking — intra-cluster
    distances are below the quantization cell size — so the floor is
    0.6 at (m=8, nbits=6), measured 0.64; coarser settings legitimately
    land lower (0.32 at nbits=4), which is the accuracy/size dial, not
    a bug."""
    import numpy as np

    from nido_spark import similarity as S

    rng = np.random.default_rng(9)
    centers = rng.normal(size=(10, 32)) * 5.0
    X = np.vstack([c + rng.normal(size=(30, 32)) * 0.3 for c in centers]).round(4)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    got = S.pq_ann_topk(df, df.where("vec_id < 5"), k=5, m=8, nbits=6).collect()
    hits = 0
    for q in range(5):
        d = ((X - X[q]) ** 2).sum(1)
        d[q] = np.inf
        exact = set(np.argsort(d, kind="stable")[:5])
        pq = {r["nbr_id"] for r in got if r["query_id"] == q}
        hits += len(exact & pq)
    assert hits / 25 >= 0.6, f"recall@5 {hits/25} too low for clustered data"


def test_pq_dim_divisibility_validated(spark):
    import pytest as _pt

    from nido_spark import similarity as S

    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with _pt.raises(ValueError):
        S.train_pq_codebooks(df, m=2)


def test_ivfpq_matches_numpy_replay_with_routing(spark):
    """IVF-PQ == the NumPy replay of (cell argmin -> n_probe routing ->
    ADC within probed cells), partition-invariant, and identical when
    both trainers' outputs are passed precomputed (train-once path)."""
    import numpy as np

    from nido_spark import similarity as S

    rng = np.random.default_rng(13)
    X = rng.normal(size=(240, 32)).round(4)
    ids = np.arange(240)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in X[i]]) for i in ids],
        "vec_id long, embedding array<double>",
    )
    n_lists, n_probe, m, nbits, k = 6, 2, 4, 4, 5
    cents = S.train_ivf_centroids(df, n_lists=n_lists, seed=3)
    cb = S.train_pq_codebooks(df, m=m, nbits=nbits, seed=3)
    C = np.asarray(cents)
    B = np.asarray(cb)
    sub = 32 // m
    nc = 1 << nbits
    # replay: cells, codes, luts, routing, adc — engine fold order
    def sq_seq(v, c):
        acc = 0.0
        for a, b in zip(v, c):
            acc += (a - b) * (a - b)
        return acc
    cells = np.array([min(range(n_lists), key=lambda j: (sq_seq(X[i], C[j]), j))
                      for i in ids])
    codes = np.empty((len(ids), m), dtype=int)
    for j in range(m):
        for i in ids:
            codes[i, j] = min(range(nc),
                              key=lambda c: (sq_seq(X[i, j*sub:(j+1)*sub], B[j][c]), c))
    want = {}
    for q in (0, 1):
        probed = sorted(range(n_lists), key=lambda j: (sq_seq(X[q], C[j]), j))[:n_probe]
        lut = [[sq_seq(X[q, j*sub:(j+1)*sub], B[j][c]) for c in range(nc)]
               for j in range(m)]
        # rank on the UNROUNDED fold (the engine rounds only for output)
        cand = [(sum(lut[j][codes[i, j]] for j in range(m)), int(i))
                for i in ids if i != q and cells[i] in probed]
        want[q] = [(i, round(d, 6)) for d, i in sorted(cand)[:k]]
    for nparts in (1, 5):
        out = S.ivfpq_ann_topk(
            df.repartition(nparts), df.where("vec_id < 2"),
            k=k, n_lists=n_lists, n_probe=n_probe, m=m, nbits=nbits,
            centroids=cents, codebooks=cb,
        ).collect()
        got = {}
        for r in sorted(out, key=lambda r: (r["query_id"], r["rank"])):
            got.setdefault(r["query_id"], []).append((r["nbr_id"], r["adist"]))
        assert got == want, f"nparts={nparts}"


def test_unigram_kl_hand_case_and_identity(spark):
    """KL against hand math on a 2-token vocab; KL(a, a) == 0; both
    directions nonnegative; counts exact."""
    import math

    from nido_spark.textops import unigram_kl

    da = spark.createDataFrame([(1, "x x y")], "doc_id long, text string")
    db = spark.createDataFrame([(2, "x y y Y")], "doc_id long, text string")
    row = unigram_kl(da, db, alpha=0.5).first()
    assert (row["vocab"], row["n_tokens_a"], row["n_tokens_b"]) == (2, 3, 4)
    pa = {"x": 2.5 / 4.0, "y": 1.5 / 4.0}      # (c + 0.5) / (3 + 0.5*2)
    pb = {"x": 1.5 / 5.0, "y": 3.5 / 5.0}      # lowercasing folds Y into y
    kl_ab = sum(pa[t] * math.log(pa[t] / pb[t]) for t in pa)
    kl_ba = sum(pb[t] * math.log(pb[t] / pa[t]) for t in pa)
    assert abs(row["kl_ab"] - round(kl_ab, 9)) < 2e-9
    assert abs(row["kl_ba"] - round(kl_ba, 9)) < 2e-9
    assert row["kl_ab"] > 0 and row["kl_ba"] > 0
    same = unigram_kl(da, da).first()
    assert same["kl_ab"] == 0.0 and same["kl_ba"] == 0.0


def test_pack_documents_replay_and_invariance(spark):
    """Exact pure-Python replay of the shard/pack/pos layout, partition
    invariance, the oversized-doc (stays whole in its start pack) and
    empty-text (0 tokens) edges, and the loud budget contract."""
    import pytest

    from nido_spark.pipeline import (
        _SAMPLE_A1, _SAMPLE_A2, _SAMPLE_B1, _SAMPLE_B2, _SAMPLE_P,
        _SAMPLE_P2, pack_documents,
    )

    texts = {i: " ".join(["t"] * (3 + i % 5)) for i in range(30)}
    texts[7] = " ".join(["t"] * 50)   # oversized: > budget on its own
    texts[11] = "   "                 # blank -> 0 tokens
    docs = spark.createDataFrame(
        [(i, texts[i]) for i in range(30)], "doc_id long, text string"
    )

    def bkt(i, seed):
        r1 = (_SAMPLE_A1 * ((i % _SAMPLE_P) + seed) + _SAMPLE_B1) % _SAMPLE_P
        return (_SAMPLE_A2 * (r1 % (1 << 30)) + _SAMPLE_B2) % _SAMPLE_P2

    def replay(budget, n_shards, seed):
        by_shard = {}
        for i, t in texts.items():
            nt = len(t.split())
            by_shard.setdefault(bkt(i, seed) % n_shards, []).append((i, nt))
        exp = {}
        for s, lst in by_shard.items():
            cum = 0
            pos = {}
            for i, nt in sorted(lst):
                pk = cum // budget
                pos[pk] = pos.get(pk, -1) + 1
                exp[i] = (s, nt, pk, pos[pk])
                cum += nt
        return exp

    for nparts in (1, 7):
        got = {
            r["doc_id"]: (r["shard"], r["n_tokens"], r["pack"], r["pack_pos"])
            for r in pack_documents(
                docs.repartition(nparts), budget=16, n_shards=3, seed=42
            ).collect()
        }
        assert got == replay(16, 3, 42), f"nparts={nparts}"
    # oversized doc occupies one pack slot where it starts; later docs in
    # the shard land in strictly later packs
    exp = replay(16, 3, 42)
    s7, _, p7, _ = exp[7]
    later = [p for i, (s, _, p, _) in exp.items()
             if s == s7 and i > 7 and p >= p7]
    assert all(p > p7 for p in later) or later == []
    with pytest.raises(ValueError, match="budget"):
        pack_documents(docs, budget=0)


def _bpe_reference(word_counts, n_merges, min_pair_count=1):
    """Pure-Python Sennrich replay: overlapping pair counts over word
    types, (cnt desc, pair asc) argmax, greedy left-to-right rewrite."""
    vocab = {w: list(w) for w in word_counts}
    merges = []
    for rank in range(n_merges):
        pc = {}
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                pc[k] = pc.get(k, 0) + word_counts[w]
        pc = {k: v for k, v in pc.items() if v >= min_pair_count}
        if not pc:
            break
        (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, c))
        for w, syms in vocab.items():
            o, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    o.append(l + r)
                    i += 2
                else:
                    o.append(syms[i])
                    i += 1
            vocab[w] = o
    return merges


def test_learn_bpe_merges_reference_replay(spark):
    """Exact replay parity on the classic Sennrich corpus, overlapping-run
    semantics (aaaa), partition invariance, early stop, loud contract."""
    import pytest

    from nido_spark.textops import learn_bpe_merges

    text = ("low low low low low lower lower newest newest newest "
            "newest newest newest widest widest widest")
    wc = {}
    for w in text.split():
        wc[w] = wc.get(w, 0) + 1
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    want = _bpe_reference(wc, 6)
    assert want[:2] == [(0, "e", "s", 9), (1, "es", "t", 9)]  # textbook
    for nparts in (1, 5):
        got = [tuple(r) for r in
               learn_bpe_merges(docs.repartition(nparts), 6).collect()]
        assert got == want, f"nparts={nparts}"

    d2 = spark.createDataFrame([(1, "aaaa aaaa")], "doc_id long, text string")
    g2 = [tuple(r) for r in learn_bpe_merges(d2, 3).collect()]
    # round 0: overlapping (a,a) counts 3 per word type x2 types... both
    # words identical -> ONE type "aaaa" cnt 2 -> pair cnt 6; round 1
    # merges (aa,aa); round 2 finds no pair -> early stop at 2 rows
    assert g2 == [(0, "a", "a", 6), (1, "aa", "aa", 2)]
    with pytest.raises(ValueError, match="n_merges"):
        learn_bpe_merges(docs, 0)


def test_bpe_token_counts_reference_replay(spark):
    """True subword counts under learned merges match a pure-Python
    encode of every word type; merges accepted as DataFrame or list;
    whitespace-only docs produce no row; truncate_every=2 exercises the
    mid-chain lineage truncation without changing results."""
    from nido_spark.textops import bpe_token_counts, learn_bpe_merges

    texts = {
        1: "low low low lower newest newest widest",
        2: "newest widest low",
        3: "   ",
        4: "aaaa lower aaaa",
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    merges_df = learn_bpe_merges(docs, 6)
    merges = [(r["left"], r["right"]) for r in merges_df.orderBy("rank").collect()]
    assert len(merges) == 6

    def enc_len(w):
        syms = list(w)
        for left, right in merges:
            o, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    o.append(left + right)
                    i += 2
                else:
                    o.append(syms[i])
                    i += 1
            syms = o
        return len(syms)

    exp = {
        d: sum(enc_len(w) for w in t.lower().split())
        for d, t in texts.items()
        if t.split()
    }
    for m in (merges_df, merges):
        got = {
            r["doc_id"]: r["n_tokens"]
            for r in bpe_token_counts(docs, m, truncate_every=2).collect()
        }
        assert got == exp, type(m)


def test_pack_documents_single_exchange_plan(spark):
    """Scale-shape pin: the whole packing job is ONE hash exchange on the
    shard column — the second window (shard, pack) is satisfied by the
    first's hashpartitioning(shard) clustering, so no further E-row
    shuffle appears in the physical plan."""
    from nido_spark.pipeline import pack_documents

    docs = spark.createDataFrame(
        [(i, "a b c") for i in range(100)], "doc_id long, text string"
    )
    out = pack_documents(docs, budget=8, n_shards=4)
    physical = out._jdf.queryExecution().executedPlan().toString()
    n_exchanges = physical.count("Exchange hashpartitioning")
    assert n_exchanges == 1, physical


def test_mix_corpus_exact_replay_and_targets(spark):
    """Epoch-mix materialization: exact pure-Python replay of the
    plan-threshold + per-copy affine decisions, token mass near the
    per-domain targets, upsampling emits whole copies, and the loud
    missing-domain contract."""
    import math

    import pytest

    from nido_spark.pipeline import (
        _SAMPLE_A1, _SAMPLE_A2, _SAMPLE_B1, _SAMPLE_B2, _SAMPLE_P,
        _SAMPLE_P2, mix_corpus, mixture_plan,
    )

    rows = [(i, "en" if i % 3 else "de", " ".join(["w"] * (5 + i % 7)))
            for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    weights, budget = {"en": 3.0, "de": 1.0}, 4000
    plan = {p["domain"]: p for p in mixture_plan(docs, weights, budget)}
    toks = {i: 5 + i % 7 for i in range(300)}
    dom = {i: ("en" if i % 3 else "de") for i in range(300)}
    for d in ("en", "de"):
        assert plan[d]["n_tokens"] == sum(
            t for i, t in toks.items() if dom[i] == d)
    assert plan["de"]["rate"] > 1.0  # de is upsampled in this fixture

    def bkt(i, seed):
        r1 = (_SAMPLE_A1 * ((i % _SAMPLE_P) + seed) + _SAMPLE_B1) % _SAMPLE_P
        return (_SAMPLE_A2 * (r1 % (1 << 30)) + _SAMPLE_B2) % _SAMPLE_P2

    exp = set()
    for d, p in plan.items():
        for i in range(max(1, math.ceil(p["rate"]))):
            thr = int(max(0.0, min(1.0, p["rate"] - i)) * _SAMPLE_P2)
            for doc, dd in dom.items():
                if dd != d:
                    continue
                u_i = (_SAMPLE_A2 * (bkt(doc, 42) + i) + _SAMPLE_B2) % _SAMPLE_P2
                if u_i < thr:
                    exp.add((doc, d, i, toks[doc]))
    for nparts in (1, 6):
        got = {(r["doc_id"], r["domain"], r["copy"], r["n_tokens"])
               for r in mix_corpus(docs.repartition(nparts), weights,
                                   budget).collect()}
        assert got == exp, f"nparts={nparts}"
    # token mass lands near each domain target (law of large numbers band)
    for d, target in (("en", 3000.0), ("de", 1000.0)):
        mass = sum(t for (_, dd, _, t) in exp if dd == d)
        assert abs(mass - target) / target < 0.05
    # every whole copy of an upsampled domain is present
    n_whole = int(plan["de"]["rate"])
    de_docs = [i for i in dom if dom[i] == "de"]
    for c in range(n_whole):
        assert all((i, "de", c, toks[i]) in exp for i in de_docs)
    with pytest.raises(ValueError, match="no"):
        mixture_plan(docs, {"fr": 1.0}, 100)
    with pytest.raises(ValueError, match="token_budget"):
        mixture_plan(docs, weights, 0)


def test_mix_corpus_map_only_plan(spark):
    """Scale-shape pin: after the single plan aggregation, materializing
    the mix is map-only — the physical plan carries a broadcast join but
    NO hash-partitioning exchange of the corpus."""
    from nido_spark.pipeline import mix_corpus

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 else "de", "a b c d") for i in range(200)],
        "doc_id long, lang string, text string",
    )
    out = mix_corpus(docs, {"en": 1.0, "de": 1.0}, 500)
    physical = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in physical, physical
    assert "BroadcastExchange" in physical or "BroadcastHashJoin" in physical


def _lev(a: str, b: str) -> int:
    # textbook DP, the independent reference for edit_distance_join
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _ed_exhaustive(rows, d):
    return {
        (ra[0], rb[0], _lev(ra[1], rb[1]))
        for i, ra in enumerate(rows)
        for rb in rows[i + 1:]
        if _lev(ra[1], rb[1]) <= d
    }


def test_edit_distance_join_exhaustive_parity(spark):
    base = "the quick brown fox jumps over the lazy dog and keeps running"
    rows = [
        (1, base),
        (2, base.replace("quick", "quack")),          # ed 1
        (3, base.replace("brown fox", "green cat")),  # ed ~7
        (4, "completely different text about spark engines and shuffles"),
        (5, base + "!!"),                              # ed 2 from 1, 4 from 2
        (6, "zz"),                                     # shorter than q: short bucket
        (7, "z"),                                      # ed 1 from 6 via short bucket
        (8, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),         # 1 distinct gram: short bucket
        (9, "aaaaaaaaaaaaaaabaaaaaaaaaaaaaa"),         # ed 1 from 8
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["a"], r["b"], r["dist"])
        for r in D.edit_distance_join(df, d=3, q=3).collect()
    }
    assert got == _ed_exhaustive(rows, 3)
    assert (6, 7, 1) in got and (8, 9, 1) in got     # short-bucket recall
    assert (1, 2, 1) in got and (1, 5, 2) in got     # prefix-filter recall


def test_edit_distance_join_on_corpus(docs):
    # real documents at sf0.001: every reported pair must verify against
    # the pure-Python DP, and the exhaustive answer must be fully recalled
    got = {
        (r["a"], r["b"], r["dist"])
        for r in D.edit_distance_join(docs, d=5, q=3).collect()
    }
    rows = [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()]
    # exhaustive reference with the length filter to keep the test quick
    ref = {
        (a, b, _lev(ta, tb))
        for i, (a, ta) in enumerate(rows)
        for (b, tb) in rows[i + 1:]
        if abs(len(ta) - len(tb)) <= 5 and _lev(ta, tb) <= 5
    }
    ref = {(min(a, b), max(a, b), x) for a, b, x in ref}
    assert got == ref
    assert len(got) > 0          # the fixture plants near-dups


def test_edit_distance_join_contracts(spark):
    df = spark.createDataFrame(
        [(1, "short"), (2, "also short")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="d must"):
        D.edit_distance_join(df, d=0)
    with pytest.raises(ValueError, match="q must"):
        D.edit_distance_join(df, q=1)
    # 'short' (3 distinct grams <= q*d = 6) is the one short-bucket doc
    with pytest.raises(ValueError, match="max_short"):
        D.edit_distance_join(df, d=2, q=3, max_short=0)


def test_dsir_weights_pure_python_replay(spark):
    """logw replayed in pure Python: add-0.5 unigram LMs over the union
    vocab of raw vs target, per-doc sum of count * log-ratio; zero-token
    docs keep (0, 0.0)."""
    import math
    from collections import Counter

    from nido_spark.pipeline import dsir_weights

    rows = [
        (1, "apple banana apple", "t"),
        (2, "car truck road", "r"),
        (3, "apple road", "r"),
        (4, "   ", "r"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, dom string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["logw"])
        for r in dsir_weights(df, df.where("dom = 't'")).collect()
    }

    def toks(t):
        t = t.lower().strip()
        return t.split() if t else []

    craw = Counter(w for _, t, _ in rows for w in toks(t))
    ctgt = Counter(w for _, t, d in rows if d == "t" for w in toks(t))
    vocab = set(craw) | set(ctgt)
    v, nr, nt = len(vocab), sum(craw.values()), sum(ctgt.values())
    lr = {
        w: math.log((ctgt[w] + 0.5) / (nt + 0.5 * v))
        - math.log((craw[w] + 0.5) / (nr + 0.5 * v))
        for w in vocab
    }
    for doc_id, text, _ in rows:
        ts = toks(text)
        want = sum(lr[w] for w in ts)
        assert got[doc_id][0] == len(ts)
        assert abs(got[doc_id][1] - want) < 1e-9, doc_id
    assert got[4] == (0, 0.0)
    # in-domain doc 1 upweighted, off-domain doc 2 downweighted
    assert got[1][1] > 0 > got[2][1]


def test_dsir_sample_race_replay_and_bias(spark):
    """Winners are exactly the k largest ROUND(round9(logw) - ln(-ln u), 9)
    keys (ties by id) — pure-Python replay of bucket + race on top of the
    replayed weights — and the winner set is biased toward the target
    domain."""
    import math
    from collections import Counter

    from nido_spark.pipeline import (
        _SAMPLE_A1, _SAMPLE_A2, _SAMPLE_B1, _SAMPLE_B2, _SAMPLE_P, _SAMPLE_P2,
        dsir_sample,
    )

    rows = []
    for i in range(120):
        if i % 3 == 0:
            rows.append((i, "alpha beta gamma alpha", "tgtlike"))
        else:
            rows.append((i, "zeta yota kappa omega", "off"))
    # the explicit target slice: first 10 target-like docs
    df = spark.createDataFrame(rows, "doc_id long, text string, dom string")
    target = df.where("dom = 'tgtlike' AND doc_id < 30")
    got = [r["doc_id"] for r in dsir_sample(df, target, k=25, seed=7).collect()]

    def toks(t):
        t = t.lower().strip()
        return t.split() if t else []

    craw = Counter(w for _, t, _ in rows for w in toks(t))
    tgt_rows = [r for r in rows if r[2] == "tgtlike" and r[0] < 30]
    ctgt = Counter(w for _, t, _ in tgt_rows for w in toks(t))
    vocab = set(craw) | set(ctgt)
    v, nr, nt = len(vocab), sum(craw.values()), sum(ctgt.values())
    lr = {
        w: math.log((ctgt[w] + 0.5) / (nt + 0.5 * v))
        - math.log((craw[w] + 0.5) / (nr + 0.5 * v))
        for w in vocab
    }

    def bucket(x, seed):
        r1 = (_SAMPLE_A1 * ((x % _SAMPLE_P) + seed) + _SAMPLE_B1) % _SAMPLE_P
        return (_SAMPLE_A2 * (r1 % (1 << 30)) + _SAMPLE_B2) % _SAMPLE_P2

    keyed = []
    for i, t, _ in rows:
        logw = round(sum(lr[w] for w in toks(t)), 9)
        u = (bucket(i, 7) + 1) / float(_SAMPLE_P2 + 1)
        keyed.append((round(logw - math.log(-math.log(u)), 9), -i))
    want = sorted(
        -i for _, i in sorted(keyed, reverse=True)[:25]
    )
    assert sorted(got) == want
    # bias: target-like docs are 1/3 of the corpus but dominate the sample
    n_tgt = sum(1 for i in got if i % 3 == 0)
    assert n_tgt > 18, n_tgt


def test_dbscan_numpy_reference_parity(spark):
    """dbscan(method='exact') vs a direct NumPy rendering of the published
    semantics (Ester '96 / sklearn core rule) with the engine's
    deterministic tie-breaks: cluster = min core id in the
    density-connected component, border = min cluster among core
    neighbors, noise = -1."""
    import numpy as np

    from nido_spark.similarity import dbscan

    rng = np.random.default_rng(3)
    # three tight blobs + per-blob fringe points (the border class) +
    # scattered noise, in 8 dims (seed picked so every row class occurs)
    centers = rng.standard_normal((3, 8)) * 4
    pts = np.vstack(
        [c + 0.35 * rng.standard_normal((14, 8)) for c in centers]
        + [c + 0.8 * rng.standard_normal((3, 8)) for c in centers]
        + [6 * rng.standard_normal((10, 8))]
    )
    eps, min_pts = 0.25, 4
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in pts[i]]) for i in range(len(pts))],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: (r["cluster"], r["is_core"])
        for r in dbscan(df, eps=eps, min_pts=min_pts, method="exact").collect()
    }

    norms = np.linalg.norm(pts, axis=1)
    cos = (pts @ pts.T) / np.outer(norms, norms)
    nbr = (cos >= 1.0 - eps) & ~np.eye(len(pts), dtype=bool)
    core = nbr.sum(axis=1) + 1 >= min_pts
    # components over core-core adjacency (BFS), label = min core id
    label = {}
    for s in np.flatnonzero(core):
        if s in label:
            continue
        comp, stack = {int(s)}, [int(s)]
        while stack:
            u = stack.pop()
            for w in np.flatnonzero(nbr[u] & core):
                if int(w) not in comp:
                    comp.add(int(w))
                    stack.append(int(w))
        m = min(comp)
        for u in comp:
            label[u] = m
    want = {}
    for i in range(len(pts)):
        if core[i]:
            want[i] = (label[i], True)
        else:
            cand = [label[int(j)] for j in np.flatnonzero(nbr[i] & core)]
            want[i] = (min(cand), False) if cand else (-1, False)
    assert got == want
    # the fixture must exercise every row class
    kinds = {(c >= 0, ic) for c, ic in want.values()}
    assert kinds == {(True, True), (True, False), (False, False)}
    assert len({c for c, ic in want.values() if ic}) >= 2


def test_dbscan_isolated_core_and_lsh_contract(spark):
    """A star whose center is core but whose leaves are not: the center is
    an ISOLATED core (no core-core edge), so CC never sees it — the label
    completion must still give it its own id, and the leaves must attach
    as borders. Also pins the lsh path's method validation."""
    import numpy as np
    import pytest as _pytest

    from nido_spark.similarity import dbscan

    base = np.eye(4)[0]
    leaves = [np.eye(4)[0] * 0.9 + 0.25 * np.eye(4)[k] for k in (1, 2, 3)]
    far = [np.eye(4)[1], np.eye(4)[2]]
    pts = [base] + leaves + far
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in p]) for i, p in enumerate(pts)],
        "vec_id long, embedding array<double>",
    )
    # cosine distances: center-leaf 0.0365, leaf-leaf 0.0716 — at
    # eps=0.05 each leaf sees ONLY the center, the center sees all three
    # leaves: center is core at min_pts=4 with zero core neighbors (the
    # isolated-core completion path), leaves are borders, far points noise
    out = {
        r["vec_id"]: (r["cluster"], r["is_core"])
        for r in dbscan(df, eps=0.05, min_pts=4, method="exact").collect()
    }
    assert out[0] == (0, True)
    assert all(out[i] == (0, False) for i in (1, 2, 3))
    assert all(out[i] == (-1, False) for i in (4, 5))
    with _pytest.raises(ValueError):
        dbscan(df, method="nope").collect()


def test_text_tiles_pure_python_replay(spark):
    """text_tiles vs a direct Python rendering of the TextTiling valley
    rule: block-Jaccard at every interior gap, boundary iff
    score < prev AND score <= next. Covers a real topic shift, a
    plateau (only its first gap may mark), and the short-doc exclusion."""
    from nido_spark.textops import text_tiles

    w = 3
    docs = [
        # two topical halves with a bridge word
        (1, "cat dog cat bird dog cat bird car road car truck road car truck"),
        # uniform text -> plateau of equal scores, no strict valley
        (2, "x y " * 8),
        # too short for any gap at w=3 (5 tokens < 2w)
        (3, "a b c d e"),
        (4, "  "),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_id"], r["gap"]): (r["score"], r["is_boundary"])
        for r in text_tiles(df, w=w).collect()
    }

    want = {}
    for did, text in docs:
        toks = text.split()
        n = len(toks)
        scores = {}
        for g in range(w, n - w + 1):
            a, b = set(toks[g - w:g]), set(toks[g:g + w])
            scores[g] = len(a & b) / len(a | b)
        gaps = sorted(scores)
        for i, g in enumerate(gaps):
            prev = scores[gaps[i - 1]] if i > 0 else None
            nxt = scores[gaps[i + 1]] if i + 1 < len(gaps) else None
            bnd = (
                prev is not None
                and nxt is not None
                and scores[g] < prev
                and scores[g] <= nxt
            )
            want[(did, g)] = (scores[g], bnd)
    assert set(got) == set(want)
    for k in want:
        assert got[k][1] == want[k][1], k
        assert abs(got[k][0] - want[k][0]) < 1e-12, k
    # the fixture must exercise a found boundary and a boundary-free doc
    assert any(b for (d, _), (_, b) in got.items() if d == 1)
    assert not any(b for (d, _), (_, b) in got.items() if d == 2)
    assert not any(d == 3 or d == 4 for (d, _) in got)
