"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry at a given sf and compare the SQL-checked ones
against DuckDB (row count, column set, order-insensitive value hash).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    try:
        import ray.data as rd
        if isinstance(result, rd.Dataset):
            return result.to_pandas()
    except ImportError:
        pass
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        if df[col].dtype == object:
            df[col] = df[col].astype(str)
    rows = sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False))
    digest = hashlib.md5()
    for row in rows:
        digest.update("|".join(row).encode())
    return digest.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for table in TABLES:
        con.execute(f"CREATE VIEW {table} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{table}.parquet')")

    sqls = entrymod.oracle_sql()
    failures = 0
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as exc:
            print(f"FAIL  {name}: query raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        elapsed = time.time() - t0
        if name not in sqls:
            print(f"ok    {name}: rows={len(got)} ({elapsed:.1f}s, rows-only)")
            continue
        want = con.execute(sqls[name]).df()
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        if set(got.columns) != set(want.columns):
            problems.append(f"cols {sorted(got.columns)} != "
                            f"{sorted(want.columns)}")
        if not problems and value_hash(got) != value_hash(want):
            problems.append("value hash mismatch")
            merged = got[sorted(got.columns)].copy()
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} ({elapsed:.1f}s)")
            failures += 1
        else:
            print(f"PASS  {name}: rows={len(got)} ({elapsed:.1f}s)")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
