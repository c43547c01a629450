"""Import every query module so the registry is fully populated on import."""

from . import aggregates, metrics, normalize_queries, relational, windows  # noqa: F401
from .registry import REGISTRY, oracle_sql, queries  # noqa: F401
