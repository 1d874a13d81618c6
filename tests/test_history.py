from __future__ import annotations

from data_pipeline_capstone_project_spark.plans.history import history_fact

import pytest
# quick smoke lane (VERDICT r13 item 8): this file is part of the
# ~1-minute `-m quick` subset; the full suite stays the snapshot gate
pytestmark = pytest.mark.quick



def test_history_schema_and_rows(spark, sf_dir):
    df = history_fact(spark, sf_dir)
    assert df.columns == [
        "id", "followers", "impressions", "reach",
        "doc_count", "fol_avg", "eng_avg", "colors",
    ]
    rows = df.collect()
    assert len(rows) > 0
    byid = {r["id"]: r for r in rows}
    # Every driving row comes from orders; series are non-null.
    assert all(r["followers"] for r in rows)
    # Sorted ascending by id (W2).
    assert [r["id"] for r in rows] == sorted(byid)


def test_history_series_is_date_ordered(spark, sf_dir):
    import duckdb

    df = history_fact(spark, sf_dir).filter("id = 1").collect()
    if not df:
        return
    got = df[0]["impressions"]
    con = duckdb.connect()
    exp = con.execute(
        f"""SELECT string_agg(CAST(o_orderkey AS VARCHAR), ', '
                   ORDER BY o_orderdate, o_orderkey)
            FROM '{sf_dir}/orders.parquet' WHERE o_custkey = 1"""
    ).fetchone()[0]
    assert got == exp
