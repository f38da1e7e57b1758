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


def test_round5_rotation_contract(ray_session):
    """The driver verifies the FIRST 50 entries of queries(); the r5
    rotation must surface 50 oracled queries disjoint from the 50 the
    driver already verified in CORRECTNESS_r04."""
    import json

    import __ray_entry__ as entrymod

    qs = list(entrymod.queries())
    rotation = entrymod._ROUND5_ROTATION
    assert len(rotation) == 50 and len(set(rotation)) == 50
    assert qs[:50] == rotation
    import pathlib

    sqls = entrymod.oracle_sql()
    assert all(name in sqls for name in rotation)   # all value-hashed
    r04 = set(json.load(open(pathlib.Path(__file__).resolve().parent.parent
                             / "CORRECTNESS_r04.json")))
    assert not r04 & set(rotation)                  # fresh coverage
    # the r04-green 50 are still registered (coverage is a union)
    assert r04 <= set(qs)


def test_one_query_runs_at_sf0001(ray_session):
    import __ray_entry__ as entrymod

    df = _to_pandas(entrymod.queries()["lang_counts"]("/root/testdata/sf0.001"))
    assert set(df.columns) == {"lang", "n_docs"}
    assert df["n_docs"].sum() == 500
