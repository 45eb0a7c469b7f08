"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at the given sf_dir, runs the matching
``oracle_sql()`` in DuckDB over the same parquet views, and compares
row count + column names + order-insensitive values.  Queries without
SQL get a rows-only check.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd
import ray

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def to_pandas(res) -> pd.DataFrame:
    if hasattr(res, "to_pandas"):
        df = res.to_pandas()
        if len(df) == 0 and len(df.columns) == 0 and hasattr(res, "schema"):
            # Dataset.to_pandas drops columns when every block is empty;
            # the driver reads Dataset.schema() instead — mirror that
            sch = res.schema()
            base = getattr(sch, "base_schema", None)
            if base is not None:
                df = base.empty_table().to_pandas()
            elif sch is not None and getattr(sch, "names", None):
                df = pd.DataFrame({n: pd.Series(dtype="object") for n in sch.names})
        return df
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]").astype(np.int64)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype(np.float64)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype(np.int64)
        elif str(df[c].dtype) == "bool":
            df[c] = df[c].astype(bool)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(ray_df) == 0 and len(sql_df) == 0:
        # the driver checks schema even on empty results (r2's one red
        # cell was exactly this) — replicate it
        if sorted(ray_df.columns) != sorted(sql_df.columns):
            problems.append(
                f"empty-result cols {sorted(ray_df.columns)} != {sorted(sql_df.columns)}"
            )
        return problems
    if len(ray_df) != len(sql_df):
        problems.append(f"rows {len(ray_df)} != {len(sql_df)}")
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"cols {sorted(ray_df.columns)} != {sorted(sql_df.columns)}")
        return problems
    a, b = canon(ray_df), canon(sql_df)
    if len(a) == len(b):
        for c in a.columns:
            if str(a[c].dtype).startswith("float"):
                eq = np.allclose(a[c].to_numpy(), b[c].to_numpy(), rtol=0, atol=0, equal_nan=True)
            else:
                eq = a[c].equals(b[c])
            if not eq:
                bad = (a[c] != b[c]) if not str(a[c].dtype).startswith("float") else ~np.isclose(a[c], b[c], rtol=0, atol=0)
                idx = np.nonzero(np.asarray(bad))[0][:3]
                problems.append(
                    f"col {c} differs at {len(np.nonzero(np.asarray(bad))[0])} rows, "
                    f"e.g. {[(a[c].iloc[i], b[c].iloc[i]) for i in idx]}"
                )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray.data

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = fn(sf_dir)
            ray_df = to_pandas(res)
        except Exception as e:
            print(f"FAIL {name}: ray error: {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name in sqls:
            try:
                sql_df = con.sql(sqls[name]).df()
            except Exception as e:
                print(f"FAIL {name}: sql error: {e}")
                failures += 1
                continue
            problems = compare(name, ray_df, sql_df)
            if problems:
                print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(problems))
                failures += 1
            else:
                print(f"OK   {name} ({dt:.1f}s): {len(ray_df)} rows value-match")
        else:
            print(f"OK?  {name} ({dt:.1f}s): rows-only, {len(ray_df)} rows")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
