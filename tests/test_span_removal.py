"""Exact-substring span removal (stages/dedup.py remove_duplicate_spans):
keep-first-copy semantics vs a single-process twin, plus edges (no
duplicates anywhere, short docs, empty text, layout invariance)."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from markdown_lab_ray.stages.dedup import _SPAN_POS_BITS


def _local_remove(rows, n):
    """Single-process twin of the keep-first rule."""
    occ = {}
    for rid, text in rows:
        words = (text or "").lower().split()
        for i in range(len(words) - n + 1):
            gh = hashlib.md5(" ".join(words[i:i + n]).encode()).hexdigest()
            occ.setdefault(gh, []).append((rid << _SPAN_POS_BITS) | i)
    dup_first = {gh: min(lst) for gh, lst in occ.items() if len(lst) >= 2}
    out = {}
    for rid, text in rows:
        words = (text or "").split()
        lower = (text or "").lower().split()
        cover = np.zeros(len(words), dtype=bool)
        for i in range(len(lower) - n + 1):
            gh = hashlib.md5(" ".join(lower[i:i + n]).encode()).hexdigest()
            owner = (rid << _SPAN_POS_BITS) | i
            if gh in dup_first and owner != dup_first[gh]:
                cover[i:i + n] = True
        kept = [w for w, c in zip(words, cover) if not c]
        out[rid] = (" ".join(kept), len(words), int(cover.sum()))
    return out


def _corpus():
    para = "the quick brown fox jumps over the lazy dog again and again"
    return [
        (1, f"intro one {para} outro one"),
        (2, f"intro two {para} outro two"),       # para duplicated
        (3, f"{para} standalone trailer words here padded up to length"),
        (4, "completely unique sentence with no repeats whatsoever in it"),
        (5, "Case SENSITIVE Words the quick brown fox jumps over the "
            "lazy dog again and again MORE tail content"),  # casing kept
        (6, "short doc"),                          # < n words
        (7, ""),                                   # empty
    ]


def _run(rows, n=8, parts=3):
    import ray.data as rd

    from markdown_lab_ray.stages.dedup import remove_duplicate_spans

    table = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    out = remove_duplicate_spans(
        rd.from_arrow(table).repartition(parts), n=n).to_pandas()
    return {int(r.doc_id): (r.clean_text, int(r.n_words),
                            int(r.n_removed_words))
            for r in out.itertuples(index=False)}


def test_span_removal_matches_twin(ray_session):
    rows = _corpus()
    assert _run(rows) == _local_remove(rows, 8)


def test_keep_first_copy_only(ray_session):
    rows = _corpus()
    got = _run(rows)
    # doc 1 is the globally-first occurrence: untouched
    assert got[1][2] == 0 and got[1][0] == rows[0][1]
    # docs 2/3/5 lose their copies of the duplicated paragraph
    for rid in (2, 3, 5):
        assert got[rid][2] > 0
        assert "quick brown fox" not in got[rid][0]
    # casing of doc 5's kept words survives
    assert got[5][0].startswith("Case SENSITIVE Words")


def test_no_duplicates_passthrough(ray_session):
    rows = [(1, "alpha beta gamma delta epsilon zeta eta theta iota"),
            (2, "one two three four five six seven eight nine ten")]
    got = _run(rows)
    for rid, text in rows:
        assert got[rid] == (text, len(text.split()), 0)


def test_short_and_empty_docs_unchanged(ray_session):
    got = _run(_corpus())
    assert got[6] == ("short doc", 2, 0)
    assert got[7] == ("", 0, 0)


def test_span_removal_layout_invariant(ray_session):
    rows = _corpus()
    a = _run(rows, parts=1)
    b = _run(list(reversed(rows)), parts=5)
    assert a == b


def test_rejects_bad_n(ray_session):
    import ray.data as rd

    from markdown_lab_ray.stages.dedup import remove_duplicate_spans

    ds = rd.from_items([{"doc_id": 1, "text": "x"}])
    with pytest.raises(ValueError, match="n must be positive"):
        remove_duplicate_spans(ds, n=0)
