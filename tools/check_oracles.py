"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` side-by-side on a given
sf dir, compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

warnings.filterwarnings("ignore")


def to_pandas(obj):
    import pandas as pd
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df):
    import numpy as np
    import pandas as pd

    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else str(v)
            )
        elif str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype) in ("int32", "int16", "int8"):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = np.round(df[c].astype("float64"), 9)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    import duckdb
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry_mod

    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        mine = canon(to_pandas(fn(sf_dir)))
        if name not in sqls:
            print(f"{name:20s} rows-only: {len(mine)} rows, cols {list(mine.columns)}")
            continue
        oracle = canon(con.execute(sqls[name]).df())
        status = []
        if len(mine) != len(oracle):
            status.append(f"ROWS {len(mine)} vs {len(oracle)}")
        if list(mine.columns) != list(oracle.columns):
            status.append(f"COLS {list(mine.columns)} vs {list(oracle.columns)}")
        if not status:
            if mine.equals(oracle):
                status.append("OK")
            else:
                neq = (mine != oracle) & ~(mine.isna() & oracle.isna())
                bad_cols = [c for c in mine.columns if neq[c].any()]
                status.append(f"VALUES differ in {bad_cols}")
                for c in bad_cols[:2]:
                    i = neq[c].idxmax()
                    status.append(f"  e.g. row {i} {c}: {mine[c][i]!r} vs {oracle[c][i]!r}")
        ok = status == ["OK"]
        failures += 0 if ok else 1
        print(f"{name:20s} {'; '.join(status)}  ({len(mine)} rows)")
    print("FAILURES:", failures)
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
