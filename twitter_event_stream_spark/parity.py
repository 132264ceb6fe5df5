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


def canon_pandas(pdf) -> list[tuple[str, ...]]:
    """Driver-equivalent canonical form of a pandas DataFrame.

    The graded driver canonicalizes through pandas: column-name sort, then
    ``sort_values`` over every column (which raises ``TypeError: unhashable
    type`` on ndarray/list cells — nested output columns must be serialized
    by the query itself), then a per-cell hash that *sees pandas dtypes*:
    a DuckDB HUGEINT arriving as float64 renders ``99111.0`` while Spark's
    int64 renders ``99111`` and the hashes diverge even though the values
    are equal. ``str()`` on the raw numpy scalars reproduces exactly that
    sensitivity, so dtype drift fails here before it fails in the graded
    run. Round-1 failure classes (both reproduced by this form):
    HUGEINT→float64 sums and ndarray cells from array-typed outputs.
    """
    import pandas as pd

    pdf = pdf[sorted(pdf.columns)]
    if len(pdf.columns) and len(pdf):
        # identical crash surface to the driver: ndarray cells raise here
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    out: list[tuple[str, ...]] = []
    for row in pdf.itertuples(index=False, name=None):
        cells = []
        for v in row:
            try:
                missing = v is None or pd.isna(v)
            except (TypeError, ValueError):  # pd.isna on array-likes
                missing = False
            if missing:
                cells.append("∅")
            elif isinstance(v, (_dt.date, _dt.datetime)):
                # Driver-verified: a Spark DATE (datetime.date object column)
                # hash-matches a DuckDB DATE (datetime64 at midnight), so
                # temporals are normalized to one representation.
                t = pd.Timestamp(v)
                if t.tzinfo is not None:
                    t = t.tz_convert("UTC").tz_localize(None)
                cells.append(t.isoformat(sep=" "))
            else:
                cells.append(str(v))
        out.append(tuple(cells))
    return sorted(out)


def check_query(
    spark, entry: RegisteredQuery, sf_dir: str, con: duckdb.DuckDBPyConnection
) -> ParityResult:
    """Run one HASH-contract query on both engines and diff canonical forms.

    Both result sets go through pandas (``toPandas()`` / ``.df()``) and the
    same canonicalization the driver applies, so dtype divergence and
    unhashable nested cells surface locally instead of in the graded run.
    """
    sdf = entry.fn(spark, sf_dir)
    s_pdf = sdf.toPandas()
    o_pdf = con.sql(entry.oracle).df()

    mismatches: list[str] = []
    s_cols, o_cols = sorted(s_pdf.columns), sorted(o_pdf.columns)
    if s_cols != o_cols:
        mismatches.append(f"columns differ: spark={s_cols} oracle={o_cols}")
        return ParityResult(entry.name, False, len(s_pdf), len(o_pdf), mismatches)

    for c in s_cols:
        sk, ok = s_pdf[c].dtype.kind, o_pdf[c].dtype.kind
        if (sk in "iu") != (ok in "iu") or (sk == "f") != (ok == "f"):
            mismatches.append(
                f"dtype drift on '{c}': spark={s_pdf[c].dtype} oracle={o_pdf[c].dtype}"
                " (driver hash would diverge)"
            )
    try:
        s_canon = canon_pandas(s_pdf)
        o_canon = canon_pandas(o_pdf)
    except TypeError as e:
        mismatches.append(f"driver canonicalizer would crash: {e!r}")
        return ParityResult(entry.name, False, len(s_pdf), len(o_pdf), mismatches)

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
        entry.name, not mismatches, len(s_pdf), len(o_pdf), mismatches
    )
