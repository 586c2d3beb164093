"""event_stream_aggr_spark — a PySpark-native analytics engine.

A brand-new engine with the query & data-processing capabilities of the
reference ``mata-elang-stable/event-stream-aggr`` (a Go Kafka
stream-flattening processor), re-expressed Spark-first:

- the reference's whole data path (Kafka → protobuf decode → explode
  metrics → wide projection → scalar derivations → Avro encode → Kafka)
  as one declarative Structured Streaming pipeline (``plans.snort``,
  ``streaming``, ``sources``);
- a full relational query surface (filters, aggregations, joins, window
  functions, sort/limit/set ops, scalar function families) verified
  against a DuckDB oracle (``plans.relational``);
- LLM-data-pipeline operators at 100 TB design scale: dedup (exact,
  MinHash-LSH, SimHash, n-gram Jaccard), embedding similarity search,
  text analysis, multimodal column plumbing (``operators``).

Everything is DataFrame/SQL-declarative so Catalyst + Tungsten pick the
physical strategy; Pandas UDFs only where builtins can't express the
semantics. See ARCHITECTURE.md for the scale design.
"""

__version__ = "0.1.0"
