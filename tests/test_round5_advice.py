"""Regression tests for the round-4 ADVICE findings (all five fixed in
round 5):

1. ``auto_hash_join`` broadcast path silently dropped the join
   multiplication with duplicate right keys (``pc.index_in`` keeps only
   the first match) — now falls back to the bucketed path.
2. ``HttpResolver.resolve_conditional`` bypassed ``_request``'s
   retry/backoff — a transient 503 during ETag revalidation surfaced a
   cached page as a failed fetch.
3. ``CachedResolver.resolve`` discarded the expired-but-revalidatable
   entry on a transient (status 0) conditional answer instead of
   falling through to the retry-backed full refetch.
4. ``RobotsRules.allows`` ranked rule precedence by raw pattern length
   including ``*``/``$`` metacharacters, against RFC 9309's
   octets-of-the-pattern specificity.
5. ``path_template`` collapsed all-letter 8+ char hex words
   ('deadbeef') and so over-merged real slugs into one trap template.
"""

import numpy as np
import pandas as pd
import pyarrow as pa

# ---------------------------------------------------------------- 1 --


def test_auto_hash_join_duplicate_right_keys(ray_session):
    """Duplicate keys in a measured-small right table must produce the
    full join multiplication (identical to the bucketed path), not
    first-match-only."""
    import ray.data as rd

    from markdown_lab_ray.stages.joins import auto_hash_join

    left = pd.DataFrame({"k": np.array([1, 1, 2, 3], np.int64),
                         "lv": np.array([10, 11, 20, 30], np.int64)})
    right = pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                      "rv": pa.array(["a", "b", "c"])})

    def norm(ds):
        return (ds.to_pandas().sort_values(["k", "lv", "rv"])
                .reset_index(drop=True))

    small = norm(auto_hash_join(rd.from_pandas(left), right, "k"))
    forced = norm(auto_hash_join(rd.from_pandas(left), right, "k",
                                 broadcast_max_bytes=0))
    assert small.equals(forced)
    # 2 left rows with k=1 × 2 right rows with k=1 → 4, plus k=2 → 5
    assert len(small) == 5
    assert sorted(small.loc[small["k"] == 1, "rv"]) == ["a", "a", "b", "b"]

    # unique right keys still take the broadcast path and agree
    uniq = pa.table({"k": pa.array([1, 2], pa.int64()),
                     "rv": pa.array(["a", "c"])})
    assert norm(auto_hash_join(rd.from_pandas(left), uniq, "k")).equals(
        norm(auto_hash_join(rd.from_pandas(left), uniq, "k",
                            broadcast_max_bytes=0)))


# ---------------------------------------------------------------- 2 --


def test_resolve_conditional_retries_transient_status(monkeypatch):
    """A 503 on the conditional GET must be retried with backoff like
    any other request, not returned as-is."""
    from markdown_lab_ray.sources.http import HttpResolver

    r = HttpResolver(max_retries=3, sleeper=lambda s: None)

    calls = {"n": 0}

    class _Resp:
        def __init__(self, status, headers=None, text=""):
            self.status_code = status
            self.headers = headers or {}
            self.text = text
            self.content = text.encode()

    def fake_request(method, url, timeout=None, allow_redirects=None,
                     headers=None):
        assert headers == {"If-None-Match": "et-1"}
        calls["n"] += 1
        if calls["n"] < 3:
            return _Resp(503)
        return _Resp(304)

    monkeypatch.setattr(r.session, "request", fake_request)
    assert r.resolve_conditional("http://x/p", "et-1") == (304, "", "et-1")
    assert calls["n"] == 3          # two 503s were retried

    # retries exhausted → the status surfaces as a status row, not 0
    calls["n"] = -100
    monkeypatch.setattr(
        r.session, "request",
        lambda *a, **k: _Resp(503))
    s, body, etag = r.resolve_conditional("http://x/p", "et-1")
    assert (s, body, etag) == (503, "", None)
    r.close()


# ---------------------------------------------------------------- 3 --


def test_cached_resolver_transient_conditional_falls_through():
    """status-0 conditional answer → full retry-backed refetch, NOT a
    hard (0, '') miss that throws away a revalidatable body."""
    from markdown_lab_ray.state.cache import CachedResolver

    calls = {"full": 0, "cond": 0}

    def full(url):
        calls["full"] += 1
        return 200, f"body-{calls['full']}", "et"

    def cond_blip(url, etag):
        calls["cond"] += 1
        return 0, "", None          # connection blip

    clock = {"t": 0.0}
    cache = CachedResolver(lambda u: (0, ""), ttl=10.0,
                           clock=lambda: clock["t"], full_fn=full,
                           conditional_fn=cond_blip)
    assert cache.resolve("u") == (200, "body-1")
    clock["t"] = 20.0               # expired; conditional blips
    assert cache.resolve("u") == (200, "body-2")
    assert calls == {"full": 2, "cond": 1}

    # a REAL conditional answer (404) is returned directly, no refetch
    def cond_gone(url, etag):
        calls["cond"] += 1
        return 404, "", None

    cache2 = CachedResolver(lambda u: (0, ""), ttl=10.0,
                            clock=lambda: clock["t"], full_fn=full,
                            conditional_fn=cond_gone)
    clock["t"] = 0.0
    cache2.resolve("u")
    full_before = calls["full"]
    clock["t"] = 20.0
    assert cache2.resolve("u") == (404, "")
    assert calls["full"] == full_before


# ---------------------------------------------------------------- 4 --


def test_robots_specificity_excludes_dollar_anchor():
    from markdown_lab_ray.state.robots import RobotsRules, _rule_octets

    assert _rule_octets("/p") == 2
    assert _rule_octets("/p$") == 2          # '$' anchor adds nothing
    # '*' IS counted — google/robotstxt ranks by raw pattern length,
    # so wildcard Disallow ties resolve to block (conservative)
    assert _rule_octets("/p*") == 3
    assert _rule_octets("/page/*/x") == 9

    # '/p*' (disallow, len 3) vs '/p' (allow, len 2): disallow wins,
    # matching the reference parser — the polite reading
    r = RobotsRules(disallow=["/p*"], allow=["/p"], fetched=True)
    assert not r.allows("http://h/page")

    # '$'-anchored rule must not gain a length point: '/a$' (disallow)
    # ties '/a' (allow) → allowed
    r2 = RobotsRules(disallow=["/a$"], allow=["/a"], fetched=True)
    assert r2.allows("http://h/a")

    # genuine specificity still wins: longer literal disallow beats
    # shorter allow
    r3 = RobotsRules(disallow=["/private/data"], allow=["/private"],
                     fetched=True)
    assert not r3.allows("http://h/private/data/x")
    assert r3.allows("http://h/private/other")


# ---------------------------------------------------------------- 5 --


def test_path_template_hex_requires_digit():
    from markdown_lab_ray.kernels.urls import path_template

    # all-letter hex words are real slugs, not session ids
    assert path_template("http://h/post/deadbeef") == "h/post/deadbeef"
    assert path_template("http://h/cafebabe/page") == "h/cafebabe/page"
    # hex runs containing a digit still collapse
    assert path_template("http://h/s/a1b2c3d4e5") == "h/s/H"
    assert (path_template("http://h/s/0123456789abcdef")
            == path_template("http://h/s/fedcba9876543210"))
    # pure digit runs still collapse to N
    assert path_template("http://h/post/12345") == "h/post/N"
