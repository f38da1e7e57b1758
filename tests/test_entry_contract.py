"""Driver-contract smoke: import __ray_entry__ the way the driver does
(Ray already initialised, cwd=/root/repo) and exercise the three
functions."""

import pandas as pd
import pyarrow as pa


def _to_pandas(result):
    import ray.data as rd
    if isinstance(result, rd.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def test_entry_smoke(ray_session):
    import __ray_entry__ as entrymod

    result = entrymod.entry()
    df = _to_pandas(result)
    assert len(df) >= 1
    assert {"url", "title", "payload", "n_chunks"} <= set(df.columns)


def test_contract_shape(ray_session):
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    assert len(qs) >= 25
    assert set(sqls) <= set(qs)          # every oracle has a query
    assert len(sqls) >= 15               # strong SQL-checked coverage
    assert all(callable(fn) for fn in qs.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper()
               for s in sqls.values())


def test_one_query_runs_at_sf0001(ray_session):
    import __ray_entry__ as entrymod

    df = _to_pandas(entrymod.queries()["lang_counts"]("/root/testdata/sf0.001"))
    assert set(df.columns) == {"lang", "n_docs"}
    assert df["n_docs"].sum() == 500
