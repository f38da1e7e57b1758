"""URL scalar functions used in frontier normalization and output naming.

Behavior-parity with the reference's ``markdown_lab/utils/url_utils.py``
(M16 in SURVEY.md §2.2).  ``normalize_url`` defines URL identity for the
URL-seen set.
"""

from __future__ import annotations

import hashlib
import re
from typing import Optional, Tuple
from urllib.parse import urlparse

_UNSAFE_RE = re.compile(r'[\\/*?:"<>|]')


def validate_url(url: str) -> Tuple[bool, Optional[str]]:
    if not url:
        return False, "URL cannot be empty"
    if not url.startswith(("http://", "https://")):
        return False, "URL must start with http:// or https://"
    try:
        if not urlparse(url).netloc:
            return False, "Invalid URL format"
    except Exception:
        return False, "Invalid URL format"
    return True, None


def _normalized_from_parts(parts) -> str:
    path = parts.path if parts.path == "/" else parts.path.rstrip("/")
    out = f"{parts.scheme}://{parts.netloc}{path}"
    if parts.query:
        out += f"?{parts.query}"
    return out


def normalize_url(url: str) -> str:
    """Strip fragment; strip trailing slash except for the root path.

    This is the identity function for the URL-seen set
    (ref ``url_utils.py:115-140``).
    """
    return _normalized_from_parts(urlparse(url))


def normalize_and_host(url: str) -> tuple[str, str]:
    """(normalize_url(url), get_domain_from_url(url)) with ONE urlparse
    — the crawl link-explode hot path derives norm/seen-key/seq-no/host
    per link, so the shared parse matters at 10^10 links."""
    parts = urlparse(url)
    return _normalized_from_parts(parts), parts.netloc


def url_seen_key(url: str) -> str:
    """md5 of the normalized URL — the key of the url_seen table
    (ref cache key scheme ``markdown_lab/core/cache.py:49-58``)."""
    return hashlib.md5(normalize_url(url).encode("utf-8")).hexdigest()


def extract_base_url(url: str) -> str:
    parts = urlparse(url)
    return f"{parts.scheme}://{parts.netloc}"


def get_domain_from_url(url: str) -> str:
    return urlparse(url).netloc


def is_absolute_url(url: str) -> bool:
    return url.startswith(("http://", "https://"))


def get_url_path_parts(url: str) -> list[str]:
    return [p for p in urlparse(url).path.strip("/").split("/") if p]


def sanitize_filename_part(part: str) -> str:
    return _UNSAFE_RE.sub("_", part)


def get_filename_from_url(url: str, output_format: str) -> str:
    """Safe output filename with extension; long names get a sha1 suffix
    (ref ``url_utils.py:46-94``)."""
    ext_map = {"markdown": ".md", "json": ".json", "xml": ".xml"}
    ext = ext_map.get(output_format.lower(), f".{output_format}")

    parts = urlparse(url)
    safe = (parts.netloc + parts.path).replace("/", "_").replace("\\", "_") or "file"
    safe = safe.split("?", 1)[0].split("#", 1)[0]
    safe = _UNSAFE_RE.sub("_", safe)

    if len(safe) > 200:
        suffix = hashlib.sha1(safe.encode("utf-8")).hexdigest()[:10]
        safe = f"{safe[:200]}_{suffix}"
    max_total = 255 - len(ext)
    return f"{safe[:max_total]}{ext}"


def redirect_target(status: int, body, base_url: str):
    """3xx responses carry the Location target (the resolver contract
    puts it in the body / ``location`` header).  Returns the absolute
    target URL, or None for non-redirects / blank locations.

    Crawl semantics (shared by engine AND sequential oracle — both call
    this one kernel): a redirect target is enqueued as a next-round
    frontier candidate rather than followed inline.  Inline following
    would bypass the TARGET host's politeness budget on cross-host
    redirects and break the BSP round accounting; the frontier path
    gives the target the same seen-set dedup, robots check and
    per-host budget as any discovered link, and redirect LOOPS
    terminate for free (the seen set admits each URL once).
    """
    if 300 <= status < 400 and isinstance(body, str) and body.strip():
        from .html_kernels import resolve_url
        return resolve_url(base_url, body.strip())
    return None


# hex runs must contain at least one digit: all-letter words like
# 'deadbeef'/'cascade' are far more likely real slugs than session ids,
# and the digit-run collapse below still catches pure-numeric ids
_LONG_HEX_RE = re.compile(r"(?=[0-9a-fA-F]*\d)[0-9a-fA-F]{8,}")
_DIGIT_RUN_RE = re.compile(r"\d+")


def path_template(url: str) -> str:
    """Crawler-trap signature of a URL: host + path with long hex runs
    (session ids, content hashes) collapsed to ``H`` and digit runs
    (dates, page numbers, calendar offsets) to ``N``, plus the SORTED
    query keys with values dropped.  Two URLs that differ only in such
    generated parts share a template — the unit the trap guard caps on
    (a calendar widget emits one template; a real article index emits
    it too, which is why the cap is per PAGE, not global)."""
    from urllib.parse import urlsplit

    p = urlsplit(url)
    path = _LONG_HEX_RE.sub("H", p.path)
    path = _DIGIT_RUN_RE.sub("N", path)
    query = ""
    if p.query:
        keys = sorted({kv.split("=", 1)[0]
                       for kv in p.query.split("&") if kv})
        query = "?" + "&".join(keys)
    return f"{p.netloc.lower()}{path}{query}"
