"""Shared Spark-vs-DuckDB comparison harness mimicking the driver's check:
row count + column names/types + order-insensitive value comparison on
name-sorted columns."""

from __future__ import annotations

import math

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_connection(sf_dir: str):
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def compare(spark_df, con, sql: str) -> dict:
    """Returns {'ok': bool, 'detail': str}."""
    sp = spark_df.toPandas()
    dk = con.execute(sql).fetchdf()
    out = {"ok": True, "detail": ""}
    if len(sp) != len(dk):
        return {"ok": False,
                "detail": f"row count {len(sp)} vs {len(dk)}"}
    sp_cols, dk_cols = sorted(sp.columns), sorted(dk.columns)
    if sp_cols != dk_cols:
        return {"ok": False, "detail": f"columns {sp_cols} vs {dk_cols}"}
    a = [tuple(_norm(v) for v in row) for row in
         sp[sp_cols].itertuples(index=False, name=None)]
    b = [tuple(_norm(v) for v in row) for row in
         dk[dk_cols].itertuples(index=False, name=None)]
    sa, sb = sorted(a, key=repr), sorted(b, key=repr)
    if sa != sb:
        diff = [(x, y) for x, y in zip(sa, sb) if x != y][:3]
        return {"ok": False, "detail": f"value mismatch, first diffs: {diff}"}
    return out
