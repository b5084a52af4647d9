"""Arrow-vectorized kernels: the pandas-UDF rendering of the Louvain gain
argmax (reference louvain_update, /root/reference/graph_cuda.cu:1450-1540).

Two renderings of the same operator exist in this engine:

1. **SQL** (louvain.louvain_move_candidates): groupBy(src).agg(max(struct))
   — stays in Tungsten/whole-stage codegen.
2. **Arrow blocks** (this module): the candidate table is grouped into
   ``n_blocks`` hash blocks of vertices; each block arrives in one pandas
   DataFrame where the per-vertex argmax is a NumPy segment reduction
   (lexsort + boundary mask — the applyInPandas analogue of the
   warp-per-vertex scan + shuffle reduce in the reference kernel).

Block-level grouping (not per-vertex grouping) is what makes the UDF
vectorized: one Arrow batch carries ~V/n_blocks vertices, so Python-side
cost is O(batch) NumPy ops, never per-row Python. Semantics are identical
to the SQL rendering (same gain formula, same smallest-comm-id tie-break)
and pinned by tests against it and the NumPy oracle.

``louvain.louvain_sweep(kernel=...)`` selects the rendering; bench.py
compares them — keep whichever wins at the deployment's scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_SCHEMA = "v long, cur_comm long, best_comm long, gain double"


def _block_argmax(pdf: pd.DataFrame, gamma: float = 1.0) -> pd.DataFrame:
    """Per-vertex best move within one vertex block (NumPy segment ops).
    ``gamma`` (resolution) arrives via closure — a driver-side scalar like
    ``n_blocks``, not worth an 8-byte column per scored row."""
    src = pdf["src"].to_numpy(np.int64)
    dst_comm = pdf["dst_comm"].to_numpy(np.int64)
    e_vc = pdf["e_vc"].to_numpy(np.float64)
    k = pdf["k"].to_numpy(np.float64)
    my = pdf["my_comm"].to_numpy(np.int64)
    a_dst = pdf["a_dst"].to_numpy(np.float64)
    a_my = pdf["a_my"].to_numpy(np.float64)
    m = float(pdf["m"].iloc[0]) if len(pdf) else 0.0

    is_self = dst_comm == my
    # self weight per src (gather-scatter: add.at == atomic scatter-add)
    order_src = np.argsort(src, kind="stable")
    s_sorted = src[order_src]
    uniq_src, first_idx = np.unique(s_sorted, return_index=True)
    self_w = np.zeros(len(uniq_src))
    idx_of = np.searchsorted(uniq_src, src)
    np.add.at(self_w, idx_of[is_self], e_vc[is_self])

    ext = ~is_self
    if not ext.any():
        return pd.DataFrame(columns=["v", "cur_comm", "best_comm", "gain"]).astype(
            {"v": "int64", "cur_comm": "int64", "best_comm": "int64", "gain": "float64"}
        )
    gs, gc, ge = src[ext], dst_comm[ext], e_vc[ext]
    gk, ga = k[ext], a_dst[ext]
    gain = (ge - gamma * gk * ga / (2.0 * m)) / m
    # segment argmax with deterministic tie-break: (src asc, gain desc, comm asc)
    o = np.lexsort((gc, -gain, gs))
    gs_o, gc_o, gain_o = gs[o], gc[o], gain[o]
    first = np.ones(len(gs_o), dtype=bool)
    first[1:] = gs_o[1:] != gs_o[:-1]
    top_src, top_comm, top_gain = gs_o[first], gc_o[first], gain_o[first]

    pos = np.searchsorted(uniq_src, top_src)
    # per-src scalars (constant within a src segment)
    k_of = np.zeros(len(uniq_src))
    my_of = np.zeros(len(uniq_src), dtype=np.int64)
    amy_of = np.zeros(len(uniq_src))
    k_of[idx_of] = k
    my_of[idx_of] = my
    amy_of[idx_of] = a_my
    self_term = (
        self_w[pos] - gamma * k_of[pos] * (amy_of[pos] - k_of[pos]) / (2.0 * m)
    ) / m
    return pd.DataFrame(
        {
            "v": top_src,
            "cur_comm": my_of[pos],
            "best_comm": top_comm,
            "gain": top_gain - self_term,
        }
    )


def louvain_move_candidates_arrow(
    edges: DataFrame,
    labels: DataFrame,
    verts: DataFrame,
    a_c: DataFrame,
    m: float,
    n_blocks: int = 64,
    gamma: float = 1.0,
) -> DataFrame:
    """Arrow-block rendering of louvain_move_candidates: same output schema
    (v, cur_comm, best_comm, gain) for every vertex with >=1 candidate."""
    state = labels.join(verts.select("v", "k"), "v")
    return louvain_move_candidates_arrow_state(
        edges, state, a_c, m, n_blocks, gamma=gamma
    )


def louvain_move_candidates_arrow_state(
    edges: DataFrame,
    state: DataFrame,
    a_c: DataFrame,
    m: float,
    n_blocks: int = 64,
    broadcast_state: bool = False,
    gamma: float = 1.0,
) -> DataFrame:
    """Arrow kernel over the combined (v, comm, k) state table (one V-row
    join attaches my_comm and k together — see louvain._move_candidates_state;
    ``broadcast_state`` statically broadcasts the V-row sides, same gate)."""
    bc = F.broadcast if broadcast_state else (lambda df: df)
    lab_dst = state.select(F.col("v").alias("dst"), F.col("comm").alias("dst_comm"))
    cand = (
        edges.withColumn(
            "w_eff", F.when(F.col("src") == F.col("dst"), F.lit(0.0)).otherwise(F.col("w"))
        )
        .join(bc(lab_dst), "dst")
        .groupBy("src", "dst_comm")
        .agg(F.sum("w_eff").alias("e_vc"))
    )
    sk = state.select(F.col("v").alias("src"), F.col("comm").alias("my_comm"), "k")
    a_dst = a_c.select(F.col("comm").alias("dst_comm"), F.col("a_c").alias("a_dst"))
    a_my = a_c.select(F.col("comm").alias("my_comm"), F.col("a_c").alias("a_my"))
    scored = (
        cand.join(bc(sk), "src")
        .join(bc(a_dst), "dst_comm")
        .join(bc(a_my), "my_comm")
        .withColumn("m", F.lit(m))
        .withColumn("block", F.pmod(F.xxhash64("src"), F.lit(n_blocks)))
    )
    g = float(gamma)
    return scored.groupBy("block").applyInPandas(
        lambda _key, pdf: _block_argmax(pdf, g), schema=_OUT_SCHEMA
    )
