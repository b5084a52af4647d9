"""nido_spark — a from-scratch PySpark-native link-graph analytics engine.

Re-expresses the *capabilities* of the reference (sg0/nido: batched Louvain
community detection on GPUs; see /root/reference) in idiomatic Spark:

- canonical edge DataFrame ``edges(src: long, dst: long, w: double)`` with
  both directions of every undirected edge materialized (reference keeps a
  directed representation of an undirected graph, graph.cpp:104-105);
- vertex aggregates / mass as groupBy aggregations (graph.cpp:190-230);
- batched block-synchronous Louvain with dQ<0 rollback and multi-phase
  coarsening (louvain_gpu.cpp:53-139, graph_gpu.cpp:1382-1545);
- companion algorithms (PageRank, connected components, label propagation,
  triangle counting) in the same join+vectorized-aggregate style;
- training-data pipeline operators (dedup, similarity search, text analysis,
  multimodal plumbing) over document/embedding tables.

Everything is DataFrame/Catalyst first; Python only ever touches data through
Arrow-vectorized pandas UDFs (never per-row).
"""

from nido_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
