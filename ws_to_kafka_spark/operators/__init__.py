"""Batch operator surface (SURVEY.md §2.3).

Each module registers named queries into :mod:`registry`; the driver-facing
``__spark_entry__.py`` exposes the registry as ``queries()`` /
``oracle_sql()``. Import order only matters in that importing this package
populates the registry.
"""

from . import (  # noqa: F401  (imports populate the registry)
    relational,
    scalar_functions,
    windows,
    dedup,
    similarity,
    text_analysis,
    multimodal,
    udfs,
    analytics_ext,
    tpch_suite,
    pipeline_ops,
    quality,
    timeseries,
    graph,
    layout,
)
from ..streaming import ops as streaming_ops  # noqa: F401  (batch twins)
from .registry import QUERIES, QuerySpec  # noqa: F401
