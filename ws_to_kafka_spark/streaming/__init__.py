"""Streaming pipelines: the WebSocket→Kafka dataflow (reference parity)
and the streaming analytics operators (watermark, dedup, stateful agg)."""

from .pipeline import build_stream, start_pipeline  # noqa: F401
