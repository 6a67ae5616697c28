"""ws_to_kafka_spark — a PySpark-native analytics engine.

A brand-new engine with the capabilities of the reference connector
``slabko/ws-to-kafka`` (a WebSocket -> Kafka forwarder, see
``/root/reference/src/main.cpp``), re-expressed Spark-first:

* the reference's single fixed dataflow (WebSocket source -> static key +
  processing-time timestamp -> Kafka sink) becomes a Structured Streaming
  pipeline built from a custom Python DataSource plus the built-in Kafka sink
  (``ws_to_kafka_spark.sources`` / ``ws_to_kafka_spark.streaming``);
* on top of that, a batch analytics surface (relational operators, scalar
  function library, LLM-data-pipeline operators: dedup, similarity search,
  multimodal columns, text analysis) over parquet fixtures, designed for
  100 TB scale (``ws_to_kafka_spark.operators`` / ``.functions``).

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, join strategy and AQE; Python UDFs appear only where built-ins
cannot express the semantics, and then always Arrow-vectorized.
"""

__version__ = "0.1.0"
