"""Import every query module so the registry is fully populated on import."""

from . import (  # noqa: F401
    advanced,
    aggregates,
    analytics,
    cluster_tfidf,
    extensions_queries,
    governance,
    graph_queries,
    lakehouse_queries,
    metrics,
    multimodal_streaming_queries,
    normalize_queries,
    packing,
    product_analytics,
    relational,
    retrieval,
    reshape,
    stats,
    training_pipeline,
    windows,
)
from .registry import REGISTRY, oracle_sql, queries  # noqa: F401
