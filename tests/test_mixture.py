"""Training-mixture pipeline (pipelines/mixture.py): each gate drops
exactly what it should, and the packing runs over survivors only."""

import pyarrow as pa


def _mix(rows, bench_rows, **kw):
    import ray.data as rd

    from markdown_lab_ray.pipelines.mixture import training_mixture

    def tbl(rs):
        return pa.table({
            "doc_id": pa.array([r[0] for r in rs], pa.int64()),
            "text": pa.array([r[1] for r in rs], pa.string()),
        })

    ds = training_mixture(rd.from_arrow(tbl(rows)).repartition(3),
                          rd.from_arrow(tbl(bench_rows)), **kw)
    out = ds.to_pandas()
    if out.empty:
        # Ray drops column names on empty to_pandas(); the Dataset
        # itself stays typed — assert that contract here
        assert ds.schema().names == ["doc_id", "n_tokens", "pack_id"]
        return out
    return out.sort_values("doc_id").reset_index(drop=True)


GOOD = ("the project and the data of a stream to learn in time is it "
        "that good for the model and the answer of a test " * 3)


def test_each_gate_drops_its_target(ray_session):
    bench = [(1000, "held out benchmark sentence with unique "
                    "evaluation content nobody should train on")]
    rows = [
        (1, GOOD),                                     # survives
        (2, GOOD),                                     # exact dup of 1
        (3, "%%% ### !!! @@@ ^^^ &&& ***"),            # low quality
        (4, GOOD + " held out benchmark sentence with unique "
                   "evaluation content nobody should train on"),  # contaminated
        (5, GOOD + " extra unique tail words here"),   # survives
    ]
    out = _mix(rows, bench)
    assert out["doc_id"].tolist() == [1, 5]
    assert (out["n_tokens"] > 0).all()
    # greedy packing in id order: first doc starts pack 0
    assert out["pack_id"].iloc[0] == 0


def test_packing_respects_budget(ray_session):
    rows = [(i, GOOD) if i == 1 else (i, GOOD + f" tail {i} unique")
            for i in range(1, 9)]
    out = _mix(rows, [(999, "nothing shared")], budget=200)
    # exclusive-prefix-sum packing: pack boundaries at 200 tokens
    excl = out["n_tokens"].cumsum().shift(fill_value=0)
    assert (out["pack_id"] == excl // 200).all()


def test_empty_corpus(ray_session):
    out = _mix([(1, "")], [(2, "bench")])  # empty text fails quality
    assert len(out) == 0


def test_cli_mixture_verb(ray_session, tmp_path, capsys):
    import pyarrow.parquet as pq

    from markdown_lab_ray.cli import main

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([GOOD, GOOD, GOOD + " unique tail here"],
                         pa.string()),
    })
    bench = pa.table({
        "doc_id": pa.array([9], pa.int64()),
        "text": pa.array(["held out benchmark content"], pa.string()),
    })
    pq.write_table(docs, tmp_path / "docs.parquet")
    pq.write_table(bench, tmp_path / "bench.parquet")
    out = tmp_path / "packed"
    code = main(["mixture", "--docs", str(tmp_path / "docs.parquet"),
                 "--bench", str(tmp_path / "bench.parquet"),
                 "--out", str(out)])
    assert code == 0
    assert "packed=2" in capsys.readouterr().out  # doc 2 deduped away
    back = pq.read_table(out).to_pandas().sort_values("doc_id")
    assert back["doc_id"].tolist() == [1, 3]
    assert set(back.columns) == {"doc_id", "n_tokens", "pack_id"}
