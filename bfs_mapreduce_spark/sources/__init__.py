from bfs_mapreduce_spark.sources.readers import (
    TABLES,
    load_table,
    load_tables,
    read_edge_list,
)

__all__ = ["TABLES", "load_table", "load_tables", "read_edge_list"]
