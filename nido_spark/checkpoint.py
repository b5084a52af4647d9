"""Durable checkpoint/resume for the Louvain dendrogram.

No reference analogue (nido restarts from scratch); specified by the north
rule: "each Louvain level checkpointed with per-partition lineage and
metrics so a killed job resumes mid-dendrogram".

Layout under ``root``::

    manifest.json                  - latest committed phase + history
    phase_0001/edges/...parquet    - coarsened edge table after phase 1
    phase_0001/flat/...parquet     - flat clustering after phase 1
    phase_0001/metrics.json        - per-partition rows/bytes/checksums

The manifest is written atomically (tmp + rename) AFTER the phase's parquet
commits, so a kill at any point leaves either the previous or the new phase
fully intact. ``resume`` replays from the newest committed phase boundary.

Parquet (not RDD checkpoints) is deliberate: it is re-readable by a NEW
SparkSession — which is what "a killed job resumes" actually requires —
and gives real file statistics back to the optimizer on resume.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def partition_metrics(df: DataFrame) -> list[dict[str, Any]]:
    """Per-partition lineage metrics: (partition_id, rows, checksum).
    Checksum = sum of xxhash64 over all columns — order-insensitive within
    a partition, so it is stable under task retry."""
    rows = (
        df.withColumn("__pid", F.spark_partition_id())
        .withColumn("__h", F.xxhash64(*df.columns))
        .groupBy("__pid")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            # decimal(38,0) sum: xxhash64 longs overflow int64 under ANSI
            F.sum(F.col("__h").cast("decimal(38,0)")).alias("checksum"),
        )
        .collect()
    )
    return [
        {"partition": r["__pid"], "rows": r["rows"], "checksum": str(r["checksum"])}
        for r in sorted(rows, key=lambda r: r["__pid"])
    ]


def _dir_bytes(path: str) -> int:
    total = 0
    for base, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(base, f))
    return total


class LouvainCheckpointer:
    """Plugs into nido_spark.louvain.louvain(checkpointer=...)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- write path ---------------------------------------------------------

    def save_phase(
        self,
        phase: int,
        edges: DataFrame,
        flat: DataFrame,
        history: list[dict],
        done: bool,
    ) -> None:
        pdir = os.path.join(self.root, f"phase_{phase:04d}")
        edges.write.mode("overwrite").parquet(os.path.join(pdir, "edges"))
        flat.write.mode("overwrite").parquet(os.path.join(pdir, "flat"))
        metrics = {
            "phase": phase,
            "written_at": time.time(),
            "edges": {
                "partitions": partition_metrics(edges),
                "bytes": _dir_bytes(os.path.join(pdir, "edges")),
            },
            "flat": {
                "partitions": partition_metrics(flat),
                "bytes": _dir_bytes(os.path.join(pdir, "flat")),
            },
        }
        with open(os.path.join(pdir, "metrics.json"), "w") as f:
            json.dump(metrics, f)
        manifest = {"phase": phase, "done": done, "history": history}
        tmp = os.path.join(self.root, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.root, "manifest.json"))

    # -- read path ----------------------------------------------------------

    def manifest(self) -> dict | None:
        path = os.path.join(self.root, "manifest.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def resume(
        self, spark: SparkSession
    ) -> tuple[DataFrame, DataFrame, int, list[dict]] | None:
        """(edges, flat, next_phase, history) from the newest committed
        phase, or None for a cold start. Verifies row counts against the
        stored per-partition metrics before trusting the data."""
        man = self.manifest()
        if man is None or man.get("done"):
            return None
        phase = man["phase"]
        pdir = os.path.join(self.root, f"phase_{phase:04d}")
        edges = spark.read.parquet(os.path.join(pdir, "edges"))
        flat = spark.read.parquet(os.path.join(pdir, "flat"))
        with open(os.path.join(pdir, "metrics.json")) as f:
            metrics = json.load(f)
        for name, df in (("edges", edges), ("flat", flat)):
            parts = metrics[name]["partitions"]
            want_rows = sum(p["rows"] for p in parts)
            # per-partition checksums are write-layout-specific, but their
            # SUM is a partition-independent content checksum (sum of
            # per-row xxhash64) — verify it, not just the row count, so a
            # same-cardinality corruption (duplicated row replacing a lost
            # one, bit-rot in values) cannot slip through
            want_sum = sum(int(p["checksum"]) for p in parts)
            got = df.agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("h"),
            ).first()
            got_rows = got["rows"]
            got_sum = int(got["h"]) if got["h"] is not None else 0
            if got_rows != want_rows or got_sum != want_sum:
                raise IOError(
                    f"checkpoint {pdir}/{name} is corrupt: rows {got_rows} vs "
                    f"{want_rows}, content checksum {got_sum} vs {want_sum}"
                )
        return edges, flat, phase, man.get("history", [])
