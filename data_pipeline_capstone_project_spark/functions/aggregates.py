"""Aggregate expression helpers.

The centerpiece is the deterministic ordered string-agg that replaces
Redshift ``listagg(x, ', ') WITHIN GROUP (ORDER BY k)`` (reference
``sql_queries.py:15-17`` - the per-user date-ordered follower /
impression / reach time series of the ``history`` fact table).

Spark has no ordered aggregate; the idiomatic, deterministic
composition is::

    array_join(
      transform(
        array_sort(collect_list(struct(order_keys..., value))),
        s -> s.value),
      ', ')

``collect_list`` is order-nondeterministic across shuffles, so the sort
must happen AFTER collection, inside the aggregate expression, keyed by
an explicit total order (order key + tiebreaker). This stays a single
partial-agg -> final-agg hash aggregation - one shuffle, map-side
combine, no window.  listagg skips NULL values (Redshift semantics);
we filter them out of the collected array.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def exact_avg(col: Column, scale: int = 4) -> Column:
    """Bit-deterministic mean: exact decimal sum, then one double
    division.

    ``avg(double)`` is nondeterministic across engines (and across
    shuffle orders) in the last ulp because double addition is not
    associative - fatal for hash-compared results. Summing as
    DECIMAL(38, scale) is exact and order-independent; the single
    decimal->double cast and division are then correctly rounded and
    identical everywhere. Null semantics match ``avg`` (nulls skipped;
    all-null group -> null).

    DuckDB oracle equivalent:
    ``CAST(sum(CAST(x AS DECIMAL(38,s))) AS DOUBLE) / count(x)``.
    """
    return F.sum(col.cast(f"decimal(38,{scale})")).cast("double") / F.count(col)


def oracle_exact_avg(expr: str, scale: int = 4) -> str:
    """The DuckDB SQL twin of :func:`exact_avg`."""
    return f"CAST(sum(CAST(({expr}) AS DECIMAL(38,{scale}))) AS DOUBLE) / count({expr})"


def ordered_series_array(
    value: Column, *order_by: Column, cast: str | None = "long"
) -> Column:
    """Date-ordered series as a native ArrayType column (the idiomatic
    output; the string form below is the presentation edge)."""
    v = value.cast(cast) if cast else value
    pairs = F.array_sort(
        F.collect_list(F.struct(*[k.alias(f"k{i}") for i, k in enumerate(order_by)], v.alias("v")))
    )
    pairs = F.filter(pairs, lambda s: s["v"].isNotNull())
    return F.transform(pairs, lambda s: s["v"])


def ordered_series(
    value: Column, *order_by: Column, sep: str = ", ", cast: str | None = "long"
) -> Column:
    """Redshift ``listagg(value, sep) WITHIN GROUP (ORDER BY order_by)``
    equivalent, deterministic under shuffle. NULL values are skipped
    (listagg semantics, SURVEY §7 hard-part (a))."""
    arr = ordered_series_array(value, *order_by, cast=cast)
    return F.array_join(F.transform(arr, lambda v: v.cast("string")), sep)
