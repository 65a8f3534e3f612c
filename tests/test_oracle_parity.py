"""Spark engine vs DuckDB oracle parity — the local mirror of the
driver's CORRECTNESS gate. Every ``__spark_entry__.queries()`` entry is
executed on sf0.001 and compared (columns, row count, multiset of
values) against its ``oracle_sql()`` twin."""

from __future__ import annotations

import datetime
import decimal

import duckdb
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, decimal.Decimal):
        # Keep Decimals DISTINCT from ints: DuckDB SUM(BIGINT) returns
        # HUGEINT (arrow decimal128), which the driver's value hash treats
        # as a different type even when values are numerically identical
        # (the round-3 pagerank failure class). Tagging forces the local
        # parity test to catch any oracle final projection that surfaces
        # a Decimal where Spark yields int64/double.
        return ("decimal", str(v))
    return v


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
            )
        except duckdb.Error:
            pass
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, name):
    q = entrymod.queries()[name]
    sqls = entrymod.oracle_sql()
    if name not in sqls:
        # non-SQL-expressible op: the driver records a rows-only check;
        # here we assert it runs and produces rows with a stable schema.
        df = q(spark, SF_SMOKE)
        assert len(df.columns) > 0
        assert df.count() > 0
        return

    sdf = q(spark, SF_SMOKE)
    s_cols = sdf.columns
    s_rows = [tuple(_norm(v) for v in r) for r in sdf.collect()]

    d_cols, d_rows_raw = _duck(sqls[name])
    # align column order to the Spark side (driver sorts by name; here we
    # reorder for exact tuple comparison)
    assert sorted(s_cols) == sorted(d_cols), f"{name}: columns {s_cols} vs {d_cols}"
    idx = [d_cols.index(c) for c in s_cols]
    d_rows = [tuple(_norm(r[i]) for i in idx) for r in d_rows_raw]

    assert len(s_rows) == len(d_rows), f"{name}: {len(s_rows)} vs {len(d_rows)} rows"
    missing = set(d_rows) - set(s_rows)
    extra = set(s_rows) - set(d_rows)
    assert sorted(s_rows) == sorted(d_rows), (
        f"{name}: value mismatch; oracle-only sample: {list(missing)[:3]}; "
        f"engine-only sample: {list(extra)[:3]}"
    )
