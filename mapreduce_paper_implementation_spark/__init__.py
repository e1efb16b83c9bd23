"""PySpark-native analytics engine with the capabilities of
nikkiDEEE/mapreduce-paper-implementation.

The reference (read at /root/reference) implements the MapReduce model
(Dean & Ghemawat, OSDI 2004): whole-file scan -> Map UDF -> hash shuffle
-> group-by-key -> Reduce UDF -> partitioned text sink. This package
re-expresses that surface Spark-first (DataFrame/Catalyst), keeps an
RDD-based ``mr_run`` compatibility API for arbitrary user map/reduce
functions, and extends the engine with training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) designed
for 100 TB scale.
"""

from mapreduce_paper_implementation_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
