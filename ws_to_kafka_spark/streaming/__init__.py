"""Streaming pipelines: the WebSocket→Kafka dataflow (reference parity)
and the streaming analytics operators (watermark, dedup, stateful agg)."""

from .pipeline import build_stream, build_writer, start_pipeline  # noqa: F401
