"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same sf dir; compare row
count, column names, and order-insensitive values.

Usage: PYTHONPATH=/root/repo python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402
from nido_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def dtype_family(dt) -> str:
    """Coarse dtype family used to replicate the driver's value-hash semantics.

    The driver canonicalizes cell values before hashing, so Spark bigint 0 vs
    DuckDB HUGEINT-surfaced-as-float 0.0 hash DIFFERENTLY even though numpy
    broadcast equality says they match. Round 2 shipped exactly that bug
    (events_sessionize/events_session_stats): values identical row-for-row,
    driver hash red. Int-vs-float (or any family mismatch) is therefore a
    local FAILURE, not a pass.
    """
    if isinstance(dt, pd.CategoricalDtype):
        return "object"
    if np.issubdtype(dt, np.bool_):
        return "bool"
    if np.issubdtype(dt, np.integer):
        return "int"
    if np.issubdtype(dt, np.floating):
        return "float"
    if np.issubdtype(dt, np.datetime64):
        return "datetime"
    return "object"


def family_mismatch(g: pd.DataFrame, w: pd.DataFrame) -> str | None:
    """Return a description of the first per-column dtype-family divergence."""
    for c in sorted(set(g.columns) & set(w.columns)):
        fg, fw = dtype_family(g[c].dtype), dtype_family(w[c].dtype)
        if fg != fw:
            return (
                f"col {c} dtype family spark={fg}({g[c].dtype}) vs "
                f"oracle={fw}({w[c].dtype}) — driver value-hash WILL differ"
            )
    return None


def norm_frame(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # sf-dependent VALUES-literal oracles (louvain_full) regenerate at the
    # scale under check; the driver's fixed sf0.01 is the default
    import os

    os.environ["NIDO_ORACLE_SF_DIR"] = sf_dir
    spark = get_spark("check_oracles", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = E.queries(), E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error {type(ex).__name__}: {str(ex)[:200]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(got)} rows (rows-only) [{time.time()-t0:.1f}s]")
            if len(got) == 0 and name not in ("doc_exact_dups",):
                print(f"WARN  {name}: 0 rows")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error {str(ex)[:200]}")
            failures += 1
            continue
        fam_bad = family_mismatch(got, want)
        if fam_bad:
            print(f"FAIL  {name}: {fam_bad}")
            failures += 1
            continue
        g, w = norm_frame(got), norm_frame(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL  {name}: columns {list(g.columns)} vs {list(w.columns)}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"FAIL  {name}: rows {len(g)} vs {len(w)}")
            failures += 1
            continue
        mismatch = None
        for c in g.columns:
            a, b = g[c].to_numpy(), w[c].to_numpy()
            if np.issubdtype(g[c].dtype, np.floating):
                bad = ~np.isclose(a.astype(float), b.astype(float), atol=2e-9, rtol=0, equal_nan=True)
            else:
                bad = a != b
            if bad.any():
                i = int(np.argmax(bad))
                mismatch = f"col {c} row {i}: {a[i]!r} vs {b[i]!r} ({int(bad.sum())} bad)"
                break
        if mismatch:
            print(f"FAIL  {name}: {mismatch}")
            failures += 1
        else:
            print(f"OK    {name}: {len(g)} rows [{time.time()-t0:.1f}s]")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
