"""Query registry: one entry per implemented SURVEY §2 operator.

``QUERIES[name]`` is a ``(spark, sf_dir) -> DataFrame`` callable;
``ORACLES[name]`` is the equivalent ANSI SQL DuckDB runs over the same
parquet tables. Names are shared - the driver hash-compares the two at
sf0.01. Queries with no SQL-expressible oracle (streaming, KMeans) are
registered without an oracle and carry their own pytest property checks.
"""

from __future__ import annotations

from .plans.history import history_fact, HISTORY_ORACLE_SQL
from .plans.engagement import rolling_engagement, ROLLING_ENGAGEMENT_ORACLE_SQL

QUERIES = {
    "q1_history": history_fact,
    "rolling_engagement": rolling_engagement,
}

ORACLES = {
    "q1_history": HISTORY_ORACLE_SQL,
    "rolling_engagement": ROLLING_ENGAGEMENT_ORACLE_SQL,
}
