from __future__ import annotations

import json
import os

import pytest

from nido_spark import louvain as L
from nido_spark.checkpoint import LouvainCheckpointer, partition_metrics


def test_checkpoint_roundtrip_and_resume(karate, tmp_path):
    edges, (src, dst, w) = karate
    root = str(tmp_path / "ckpt")

    # uninterrupted run with checkpointing
    res = L.louvain(edges, nbatches=4, checkpointer=LouvainCheckpointer(root), local_threshold=0)
    man = json.load(open(os.path.join(root, "manifest.json")))
    assert man["done"] is True
    assert man["phase"] == res.n_phases
    phases = sorted(d for d in os.listdir(root) if d.startswith("phase_"))
    assert len(phases) == res.n_phases
    # per-phase metrics exist and row counts are consistent
    for p in phases:
        metrics = json.load(open(os.path.join(root, p, "metrics.json")))
        assert sum(x["rows"] for x in metrics["flat"]["partitions"]) == 34
        assert metrics["edges"]["bytes"] > 0

    # simulate a kill after phase 1: rewind the manifest
    man["phase"] = 1
    man["done"] = False
    man["history"] = [h for h in man["history"] if h["phase"] < 1]
    json.dump(man, open(os.path.join(root, "manifest.json"), "w"))

    res2 = L.louvain(edges, nbatches=4, checkpointer=LouvainCheckpointer(root), local_threshold=0)
    assert res2.modularity == pytest.approx(res.modularity, abs=1e-9)
    lab1 = {r["v"]: r["comm"] for r in res.labels.collect()}
    lab2 = {r["v"]: r["comm"] for r in res2.labels.collect()}
    # resumed run replays phases >= 1 deterministically -> identical labels
    assert lab1 == lab2


def test_resume_cold_start_when_no_manifest(karate, tmp_path):
    ck = LouvainCheckpointer(str(tmp_path / "empty"))
    assert ck.resume(karate[0].sparkSession) is None


def test_corrupt_checkpoint_detected(karate, tmp_path):
    edges, _ = karate
    root = str(tmp_path / "ckpt2")
    L.louvain(edges, nbatches=2, checkpointer=LouvainCheckpointer(root), local_threshold=0)
    man = json.load(open(os.path.join(root, "manifest.json")))
    man["done"] = False
    json.dump(man, open(os.path.join(root, "manifest.json"), "w"))
    # tamper with the stored metrics
    pdir = os.path.join(root, f"phase_{man['phase']:04d}")
    metrics = json.load(open(os.path.join(pdir, "metrics.json")))
    metrics["flat"]["partitions"][0]["rows"] += 1
    json.dump(metrics, open(os.path.join(pdir, "metrics.json"), "w"))
    with pytest.raises(IOError, match="corrupt"):
        LouvainCheckpointer(root).resume(edges.sparkSession)


def test_partition_metrics_shape(karate):
    edges, _ = karate
    pm = partition_metrics(edges)
    assert sum(p["rows"] for p in pm) == edges.count()
    assert all(set(p) == {"partition", "rows", "checksum"} for p in pm)


def test_same_cardinality_corruption_detected(karate, tmp_path):
    """Row counts intact but content tampered: the partition-independent
    content checksum (sum of per-row xxhash64) must catch it."""
    edges, _ = karate
    root = str(tmp_path / "ckpt3")
    L.louvain(edges, nbatches=2, checkpointer=LouvainCheckpointer(root), local_threshold=0)
    man = json.load(open(os.path.join(root, "manifest.json")))
    man["done"] = False
    json.dump(man, open(os.path.join(root, "manifest.json"), "w"))
    pdir = os.path.join(root, f"phase_{man['phase']:04d}")
    metrics = json.load(open(os.path.join(pdir, "metrics.json")))
    # same rows, different content claim -> checksum mismatch on resume
    metrics["flat"]["partitions"][0]["checksum"] = str(
        int(metrics["flat"]["partitions"][0]["checksum"]) + 1
    )
    json.dump(metrics, open(os.path.join(pdir, "metrics.json"), "w"))
    with pytest.raises(IOError, match="content checksum"):
        LouvainCheckpointer(root).resume(edges.sparkSession)
