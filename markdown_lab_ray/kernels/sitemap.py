"""Sitemap / robots.txt kernels (pure parsing, no I/O).

Behavior-parity with the reference's sitemap discovery
(``markdown_lab/utils/sitemap_utils.py``):

- ``sitemaps_from_robots``: every ``Sitemap:`` line (case-insensitive,
  whitespace-tolerant) in a robots.txt body (ref ``:94-127``).
- ``well_known_sitemap_urls``: the 4 fallback locations probed in order
  when robots yields nothing (ref ``:325-348``).
- ``parse_sitemap_xml``: namespace-aware ``<urlset>`` / ``<sitemapindex>``
  parsing returning (url_rows, child_sitemap_urls) (ref ``:129-236``).
- ``filter_frontier_rows``: priority / include / exclude / limit filters
  preserving discovery order; a None priority PASSES min_priority
  (ref ``:353-407``).

Fetching and recursion-with-dedup live in the pipeline layer so the
seen-set can be the shared actor-backed one.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from typing import Optional

_XMLNS_RE = re.compile(r'xmlns\s*=\s*["\']([^"\']+)["\']')


def sitemaps_from_robots(robots_body: str) -> list[str]:
    found = []
    for line in robots_body.splitlines():
        stripped = line.strip()
        if stripped.lower().startswith("sitemap:"):
            found.append(stripped[len("sitemap:"):].strip())
    return found


def well_known_sitemap_urls(base_domain: str) -> list[str]:
    return [
        f"{base_domain}/sitemap.xml",
        f"{base_domain}/sitemap_index.xml",
        f"{base_domain}/sitemap/sitemap.xml",
        f"{base_domain}/sitemaps/sitemap.xml",
    ]


def _child_text(parent: ET.Element, name: str, ns: Optional[str]) -> Optional[str]:
    el = parent.find(f"sm:{name}" if ns else name, {"sm": ns} if ns else {})
    if el is not None and el.text:
        return el.text.strip()
    return None


def parse_sitemap_xml(content: str) -> tuple[list[dict], list[str]]:
    """Returns (frontier rows, child sitemap URLs).

    Rows have keys loc / lastmod / changefreq / priority; malformed XML
    yields ([], []) rather than raising.
    """
    ns_match = _XMLNS_RE.search(content)
    ns = ns_match.group(1) if ns_match else None
    ns_map = {"sm": ns} if ns else {}
    try:
        root = ET.fromstring(content)
    except ET.ParseError:
        return [], []

    if root.tag.endswith("sitemapindex"):
        children = [
            loc.text.strip()
            for loc in root.findall(".//sm:sitemap/sm:loc" if ns
                                    else ".//sitemap/loc", ns_map)
            if loc is not None and loc.text
        ]
        return [], children

    rows = []
    for url_el in root.findall(".//sm:url" if ns else ".//url", ns_map):
        loc = _child_text(url_el, "loc", ns)
        if not loc:
            continue
        priority_text = _child_text(url_el, "priority", ns)
        try:
            priority = float(priority_text) if priority_text else None
        except (TypeError, ValueError):
            priority = None
        rows.append({
            "loc": loc,
            "lastmod": _child_text(url_el, "lastmod", ns),
            "changefreq": _child_text(url_el, "changefreq", ns),
            "priority": priority,
        })
    return rows, []


def filter_frontier_rows(rows: list[dict],
                         min_priority: Optional[float] = None,
                         include_patterns: Optional[list[str]] = None,
                         exclude_patterns: Optional[list[str]] = None,
                         limit: Optional[int] = None) -> list[dict]:
    """Order-preserving frontier filters (F1–F4 in SURVEY.md §2.3)."""
    out = rows
    if min_priority is not None:
        out = [r for r in out
               if r["priority"] is None or r["priority"] >= min_priority]
    if include_patterns:
        pats = [re.compile(p) for p in include_patterns]
        out = [r for r in out if any(p.search(r["loc"]) for p in pats)]
    if exclude_patterns:
        pats = [re.compile(p) for p in exclude_patterns]
        out = [r for r in out if not any(p.search(r["loc"]) for p in pats)]
    if limit is not None:
        out = out[:limit]
    return out


def parse_links_file(body: str) -> list[str]:
    """Seed links file: strip blanks and ``#`` comments
    (ref ``markdown_lab/core/scraper.py:474-498``)."""
    out = []
    for line in body.splitlines():
        stripped = line.strip()
        if stripped and not stripped.startswith("#"):
            out.append(stripped)
    return out


def export_frontier_lines(rows: list[dict]) -> str:
    """``loc[,priority][,lastmod]`` text export (ref ``:409-431``)."""
    lines = []
    for r in rows:
        line = r["loc"]
        if r.get("priority") is not None:
            line += f",{r['priority']}"
        if r.get("lastmod") is not None:
            line += f",{r['lastmod']}"
        lines.append(line)
    return "\n".join(lines) + ("\n" if lines else "")
