"""Differential oracle harness (SURVEY §5.2.1).

Re-implements the driver's t2 check locally: run a registered Spark query and
its DuckDB oracle SQL on the same parquet fixtures, canonicalize both result
sets (sort columns by name, stringify values, sort rows) and compare. Used by
the pytest suite at sf0.001 and by ad-hoc verification at sf0.01.
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass, field

import duckdb

from twitter_event_stream_spark.registry import RegisteredQuery
from twitter_event_stream_spark.tables import TABLE_NAMES


def oracle_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """A DuckDB connection with the canonical views registered, mirroring the
    driver's pre-registration of the fixture tables."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir.rstrip('/')}/{name}.parquet')"
        )
    return con


def canon_value(v) -> str:
    """Engine-neutral canonical string for one cell value."""
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # collapse -0.0
        return f"{v:.6f}"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if hasattr(v, "tolist"):  # numpy scalars / arrays from duckdb
        return canon_value(v.tolist())
    if hasattr(v, "asDict"):  # Spark Row (struct column)
        d = v.asDict()
        return "{" + ",".join(f"{k}:{canon_value(d[k])}" for k in sorted(d)) + "}"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_value(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def canon_rows(columns: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    """Column-name-sorted, value-stringified, row-sorted canonical form."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(canon_value(row[i]) for i in order) for row in rows)


@dataclass
class ParityResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    mismatches: list[str] = field(default_factory=list)

    def report(self, limit: int = 6) -> str:
        head = f"{self.name}: rows spark={self.spark_rows} oracle={self.oracle_rows}"
        return head + "".join(f"\n  {m}" for m in self.mismatches[:limit])


def check_query(
    spark, entry: RegisteredQuery, sf_dir: str, con: duckdb.DuckDBPyConnection
) -> ParityResult:
    """Run one HASH-contract query on both engines and diff canonical forms."""
    sdf = entry.fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]
    rel = con.sql(entry.oracle)
    o_cols = list(rel.columns)
    o_rows = rel.fetchall()

    mismatches: list[str] = []
    if sorted(s_cols) != sorted(o_cols):
        mismatches.append(f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return ParityResult(entry.name, False, len(s_rows), len(o_rows), mismatches)

    s_canon = canon_rows(s_cols, s_rows)
    o_canon = canon_rows(o_cols, o_rows)
    if s_canon != o_canon:
        s_set, o_set = set(s_canon), set(o_canon)
        only_s = [r for r in s_canon if r not in o_set]
        only_o = [r for r in o_canon if r not in s_set]
        if not only_s and not only_o:
            mismatches.append("same row set, different multiplicities")
        for r in only_s[:4]:
            mismatches.append(f"spark-only {r}")
        for r in only_o[:4]:
            mismatches.append(f"oracle-only {r}")
    return ParityResult(
        entry.name, not mismatches, len(s_rows), len(o_rows), mismatches
    )
