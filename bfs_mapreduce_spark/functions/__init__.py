from bfs_mapreduce_spark.functions.numeric import dmoney, dsum_double

__all__ = ["dmoney", "dsum_double"]
