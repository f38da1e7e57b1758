"""Round-4 regression locks for the remaining approximate-path queries
(VERDICT r03 #5): knn_lsh / knn_ivf / embedding_near_dup / video_frames
at sf0.001, captured into ``tests/data/approx_fixture_sf0001.json`` —
future refactors can't silently shift approximate outputs.  The minhash
/ simhash / phash families are locked in test_neardup_regression.py.

The lock drives the REGISTERED queries() callables themselves, so any
change in default parameters is caught too.
"""

import json
import pathlib

import pytest

FIXTURE = json.loads(
    (pathlib.Path(__file__).parent / "data" /
     "approx_fixture_sf0001.json").read_text())
SF_DIR = "/root/testdata/sf0.001"


def _queries():
    import importlib.util
    root = pathlib.Path(__file__).parent.parent
    spec = importlib.util.spec_from_file_location(
        "ray_entry_for_tests", root / "__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.queries()


def _norm(v):
    import numpy as np
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.floating):
        return round(float(v), 9)
    return v


@pytest.mark.parametrize("name", ["knn_lsh", "knn_ivf",
                                  "embedding_near_dup", "video_frames",
                                  "caption_alignment", "image_mixture",
                                  "alignment_filter", "audio_features",
                                  "audio_clips", "aspect_buckets",
                                  "ann_recall"])
def test_approx_query_matches_fixture(ray_session, name):
    result = _queries()[name](SF_DIR)
    if hasattr(result, "take_all"):
        rows = result.take_all()
    else:
        rows = result.to_dict("records")
    got = [{k: _norm(v) for k, v in row.items()} for row in rows]
    got.sort(key=lambda d: json.dumps(d, sort_keys=True, default=str))
    assert got == FIXTURE[name], f"{name} drifted from committed fixture"
