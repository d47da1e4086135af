"""olake_spark — a PySpark-native ELT/replication + data-pipeline engine.

A from-scratch rebuild of the capabilities of datazip-inc/olake (an
exactly-once DB/Kafka/S3 → Iceberg/Parquet replication engine written in Go),
re-expressed Spark-first: declarative DataFrame plans, Catalyst pushdown,
Structured-Streaming-style bounded drains, and MERGE-semantics upsert sinks —
plus large-scale training-data operators (dedup, similarity search, text
analysis incl. real BPE tokenization/training, multimodal columns with real
pure-stdlib image decode/resize kernels) layered on the same engine.

Subpackages
-----------
- ``typesys``    : the 14-type widening lattice, column naming, value reformat
- ``plans``      : stream/catalog/state contracts, chunk planning, filters
- ``functions``  : engine metadata columns (_olake_*), projection, flatten
- ``sources``    : file readers + discover, JDBC predicate builders, changelog
- ``sinks``      : partitioned parquet sink, transactional managed table
- ``operators``  : merge/upsert replay, dedup family, similarity, text analysis
- ``streaming``  : bounded-drain micro-batch replay
"""

__version__ = "0.1.0"
