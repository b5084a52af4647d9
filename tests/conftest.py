from __future__ import annotations

import numpy as np
import pytest

from nido_spark.session import get_spark

# Zachary's karate club (34 vertices, 78 undirected edges, unit weights) —
# the reference's smoke input (/root/reference/README:75). 0-based.
KARATE_EDGES = [
    (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8), (0, 10),
    (0, 11), (0, 12), (0, 13), (0, 17), (0, 19), (0, 21), (0, 31), (1, 2),
    (1, 3), (1, 7), (1, 13), (1, 17), (1, 19), (1, 21), (1, 30), (2, 3),
    (2, 7), (2, 8), (2, 9), (2, 13), (2, 27), (2, 28), (2, 32), (3, 7),
    (3, 12), (3, 13), (4, 6), (4, 10), (5, 6), (5, 10), (5, 16), (6, 16),
    (8, 30), (8, 32), (8, 33), (9, 33), (13, 33), (14, 32), (14, 33),
    (15, 32), (15, 33), (18, 32), (18, 33), (19, 33), (20, 32), (20, 33),
    (22, 32), (22, 33), (23, 25), (23, 27), (23, 29), (23, 32), (23, 33),
    (24, 25), (24, 27), (24, 31), (25, 31), (26, 29), (26, 33), (27, 33),
    (28, 31), (28, 33), (29, 32), (29, 33), (30, 32), (30, 33), (31, 32),
    (31, 33), (32, 33),
]


def symmetric_arrays(pairs, weights=None):
    """(src, dst, w) numpy arrays with both directions materialized."""
    a = np.array([p[0] for p in pairs], dtype=np.int64)
    b = np.array([p[1] for p in pairs], dtype=np.int64)
    w = np.ones(len(pairs)) if weights is None else np.asarray(weights, float)
    loop = a == b
    src = np.concatenate([a, b[~loop]])
    dst = np.concatenate([b, a[~loop]])
    ww = np.concatenate([w, w[~loop]])
    return src, dst, ww


@pytest.fixture(scope="session")
def spark():
    s = get_spark("nido_spark_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def karate(spark):
    src, dst, w = symmetric_arrays(KARATE_EDGES)
    df = spark.createDataFrame(
        [(int(s), int(d), float(x)) for s, d, x in zip(src, dst, w)],
        "src long, dst long, w double",
    )
    return df.cache(), (src, dst, w)


def labels_equivalent(lab_a: dict, lab_b: dict) -> bool:
    """Exact up to relabeling: the two labelings induce the same partition."""
    if set(lab_a) != set(lab_b):
        return False
    fwd, bwd = {}, {}
    for v in lab_a:
        ca, cb = lab_a[v], lab_b[v]
        if fwd.setdefault(ca, cb) != cb or bwd.setdefault(cb, ca) != ca:
            return False
    return True
