"""Local mirror of the correctness driver's DuckDB-oracle comparison.

The driver runs each ``queries()[name]`` on Spark and ``oracle_sql()[name]``
on DuckDB over the same parquet tables, then compares row-count + schema +
order-insensitive value-hash (columns sorted by name). This module
replicates that check so every operator can be gated locally before the
driver ever sees it.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import duckdb
import pandas as pd

from .schemas import TESTDATA_TABLES


def duckdb_connect(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@dataclass
class CompareResult:
    name: str
    ok: bool
    rows_spark: int = 0
    rows_oracle: int = 0
    errors: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK" if self.ok else "FAIL"
        msg = f"[{status}] {self.name}: spark={self.rows_spark} oracle={self.rows_oracle}"
        for e in self.errors:
            msg += f"\n    - {e}"
        return msg


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            # strip tz so Spark (session-TZ-aware) and DuckDB (naive) agree
            try:
                df[c] = df[c].dt.tz_localize(None)
            except (TypeError, AttributeError):
                pass
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare_frames(name: str, sdf: pd.DataFrame, odf: pd.DataFrame,
                   float_tol: float = 0.0) -> CompareResult:
    res = CompareResult(name=name, ok=True,
                        rows_spark=len(sdf), rows_oracle=len(odf))
    if sorted(sdf.columns) != sorted(odf.columns):
        res.ok = False
        res.errors.append(
            f"column mismatch: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return res
    if len(sdf) != len(odf):
        res.ok = False
        res.errors.append("row count mismatch")
        return res
    s, o = _normalize(sdf), _normalize(odf)
    for c in s.columns:
        sk, ok_ = s[c].dtype.kind, o[c].dtype.kind
        if sk != ok_ and {sk, ok_} - {"i", "u"}:
            res.errors.append(f"dtype mismatch on {c}: spark={s[c].dtype} oracle={o[c].dtype}")
            res.ok = False
    if not res.ok:
        return res
    for c in s.columns:
        if s[c].dtype.kind == "f":
            import numpy as np
            sv, ov = s[c].to_numpy(), o[c].to_numpy()
            both_nan = pd.isna(sv) & pd.isna(ov)
            close = np.isclose(sv, ov, rtol=float_tol, atol=float_tol, equal_nan=True)
            if not (both_nan | close).all():
                bad = int((~(both_nan | close)).sum())
                res.ok = False
                res.errors.append(f"value mismatch on float col {c}: {bad} rows differ")
            elif float_tol > 0 and not (sv[~pd.isna(sv)] == ov[~pd.isna(ov)]).all():
                res.errors.append(f"note: col {c} differs within tol (driver hash may flag)")
        else:
            eq = (s[c].astype(object).where(~pd.isna(s[c]), None)
                  == o[c].astype(object).where(~pd.isna(o[c]), None))
            neq = ~(eq | (pd.isna(s[c]) & pd.isna(o[c])))
            if neq.any():
                ex_idx = neq[neq].index[0]
                res.ok = False
                res.errors.append(
                    f"value mismatch on col {c}: {int(neq.sum())} rows differ "
                    f"(e.g. spark={s[c][ex_idx]!r} oracle={o[c][ex_idx]!r})")
    return res


def compare_query(spark, name: str, sf_dir: str,
                  float_tol: float = 0.0) -> CompareResult:
    from .queries import ORACLES, QUERIES
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    sql = ORACLES.get(name)
    if sql is None:
        ok = len(sdf) >= 0
        return CompareResult(name=name, ok=ok, rows_spark=len(sdf), rows_oracle=-1,
                             errors=["rows-only check (no oracle SQL)"] if ok else ["query failed"])
    con = duckdb_connect(sf_dir)
    try:
        odf = con.execute(sql).df()
    finally:
        con.close()
    return compare_frames(name, sdf, odf, float_tol=float_tol)
