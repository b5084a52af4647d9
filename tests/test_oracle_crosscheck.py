"""Third-engine validation of the NumPy oracles themselves: hypothesis
random graphs cross-checked against networkx (a fully independent
implementation). The Spark engine is pinned to the oracles elsewhere; this
pins the oracles to an external reference, closing the loop — the same role
the reference's cuGraph comparison plays (SURVEY §5 item 2).

Pure Python (no Spark session), so hypothesis can afford many examples.
"""

from __future__ import annotations

import networkx as nx
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nido_spark import oracle as O


def _sym(pairs):
    """Symmetric src/dst/w arrays from an undirected edge set."""
    pairs = sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b})
    if not pairs:
        return None
    src = np.array([p[0] for p in pairs] + [p[1] for p in pairs], dtype=np.int64)
    dst = np.array([p[1] for p in pairs] + [p[0] for p in pairs], dtype=np.int64)
    w = np.ones(len(src))
    return src, dst, w


edge_sets = st.lists(
    st.tuples(st.integers(0, 24), st.integers(0, 24)), min_size=1, max_size=80
)


@settings(max_examples=60, deadline=None)
@given(edge_sets)
def test_k_core_matches_networkx(pairs):
    arrs = _sym(pairs)
    if arrs is None:
        return
    src, dst, w = arrs
    got = O.k_core_numpy(src, dst)
    g = nx.Graph()
    g.add_edges_from(zip(src.tolist(), dst.tolist()))
    want = nx.core_number(g)
    assert got == {int(v): int(c) for v, c in want.items()}


@settings(max_examples=60, deadline=None)
@given(edge_sets)
def test_connected_components_match_networkx(pairs):
    arrs = _sym(pairs)
    if arrs is None:
        return
    src, dst, w = arrs
    got = O.connected_components_numpy(src, dst)
    g = nx.Graph()
    g.add_edges_from(zip(src.tolist(), dst.tolist()))
    for comp in nx.connected_components(g):
        labels = {got[int(v)] for v in comp}
        assert len(labels) == 1           # one label per component
        assert labels == {min(comp)}      # label = min member id


@settings(max_examples=60, deadline=None)
@given(edge_sets)
def test_triangle_count_matches_networkx(pairs):
    arrs = _sym(pairs)
    if arrs is None:
        return
    src, dst, w = arrs
    got = O.triangle_count_numpy(src, dst)
    g = nx.Graph()
    g.add_edges_from(zip(src.tolist(), dst.tolist()))
    want = sum(nx.triangles(g).values()) // 3
    assert got == want


@settings(max_examples=40, deadline=None)
@given(
    edge_sets,
    st.lists(st.integers(0, 3), min_size=25, max_size=25),
)
def test_modularity_matches_networkx(pairs, label_choice):
    arrs = _sym(pairs)
    if arrs is None:
        return
    src, dst, w = arrs
    verts = sorted(set(src.tolist()))
    labels = {v: label_choice[v % 25] for v in verts}
    got = O.modularity_numpy(src, dst, w, labels)
    g = nx.Graph()
    g.add_edges_from(zip(src.tolist(), dst.tolist()))
    comms = {}
    for v, c in labels.items():
        comms.setdefault(c, set()).add(v)
    want = nx.algorithms.community.modularity(g, comms.values())
    assert got == pytest.approx(want, abs=1e-12)

