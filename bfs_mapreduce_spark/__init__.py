"""bfs_mapreduce_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference project Riachi02/BFS-MapReduce (a
MapReduce BFS on Ray; see SURVEY.md), generalized to a full
relational + training-data-pipeline operator surface:

- graph traversal (BFS single-source shortest path + path recovery,
  the reference's entire query surface — ``operators.graph``)
- the relational operator family (scan/filter/project/join/agg/
  window/sort/set-ops — ``operators.relational``)
- dedup (exact, MinHash-LSH, SimHash, n-gram Jaccard —
  ``operators.dedup_queries``; incremental signature-store ingestion —
  ``operators.dedup_incremental``)
- similarity search over embeddings (``operators.similarity_queries``)
- text analysis (``operators.text_queries``)
- as-of / range joins (``operators.asof_queries``)
- multimodal binary-column plumbing (``operators.multimodal_queries``)
- Structured Streaming windows/watermarks (``streaming``)

The named-query catalog (``registry.all_queries``) is the single
public surface the driver and tests consume; each module above
registers its queries there with a DuckDB oracle where SQL can
express the semantics.

Everything is expressed as DataFrame/SQL logical plans so Catalyst +
Tungsten choose physical strategy; Python touches data only through
Arrow-vectorized pandas UDFs, never row-at-a-time.
"""

from bfs_mapreduce_spark.session import get_session
from bfs_mapreduce_spark.sources.readers import load_table, load_tables, read_edge_list

__all__ = ["get_session", "load_table", "load_tables", "read_edge_list"]
