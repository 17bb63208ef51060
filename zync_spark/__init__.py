"""zync_spark — a PySpark-native analytics/stream-processing engine with the
query and data-processing capabilities of brimdata/zync (reference surveyed in
SURVEY.md; citations into /root/reference as file:line).

The reference is a Kafka↔Zed-lake connector whose query surface (scan, filter,
anti/inner join, switch routing, aggregation, sort, offset assignment, type
bridge) we re-express Spark-first: DataFrame/SQL plans optimized by Catalyst,
Structured Streaming for the Kafka paths, and parquet-backed "pools" for the
lake tables. Beyond reference parity, `functions/` adds the large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB-scale execution.
"""

__version__ = "0.1.0"

from zync_spark.session import get_spark  # noqa: F401
