"""bfs_mapreduce_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference project Riachi02/BFS-MapReduce (a
MapReduce BFS on Ray; see SURVEY.md), generalized to a full
relational + training-data-pipeline operator surface:

- graph traversal (BFS single-source shortest path + path recovery,
  the reference's entire query surface — ``operators.graph``)
- the relational operator family (scan/filter/project/join/agg/
  window/sort/set-ops — ``operators.relational``)
- dedup (exact, MinHash-LSH, SimHash, n-gram Jaccard — ``operators.dedup``)
- similarity search over embeddings (``operators.similarity``)
- text analysis (``operators.text``)
- as-of / range joins (``operators.asof``)
- multimodal binary-column plumbing (``operators.multimodal``)
- Structured Streaming windows/watermarks (``streaming``)

Everything is expressed as DataFrame/SQL logical plans so Catalyst +
Tungsten choose physical strategy; Python touches data only through
Arrow-vectorized pandas UDFs, never row-at-a-time.
"""

from bfs_mapreduce_spark.session import get_session
from bfs_mapreduce_spark.sources.readers import load_table, load_tables, read_edge_list

__all__ = ["get_session", "load_table", "load_tables", "read_edge_list"]
