"""Full query catalog: importing this module registers both the relational
surface (queries.py) and the pipeline operators (pipeline_queries.py)."""

from . import pipeline_queries as _pipeline_queries  # noqa: F401  (registers)
from .queries import QUERIES, headline_queries, oracle_sql, queries

__all__ = ["QUERIES", "queries", "oracle_sql", "headline_queries"]
