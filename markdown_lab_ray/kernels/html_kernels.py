"""HTML extraction kernels with reference-parity semantics.

Re-implements, row-locally and from scratch, the behavior of the
reference's Rust parser/converter front half:

- ``clean_html`` / unwanted-element removal  (ref ``src/html_parser.rs:104-126``)
- ``extract_main_content``                   (ref ``src/html_parser.rs:63-86``)
- ``extract_links``                          (ref ``src/html_parser.rs:214-252``)
- ``resolve_url``                            (ref ``src/html_parser.rs:268-278``)
- ``get_element_text``                       (ref ``src/html_parser.rs:293-301``)
- ``parse_html_to_document``                 (ref ``src/markdown_converter.rs:76-323``)

Intentional quirks preserved (SURVEY.md §7.5): headings are emitted in
level order h1..h6 then document order within a level; the ``pre, code``
selector double-counts ``<pre><code>`` pairs; list item extraction
flattens nested ``li`` descendants; the link predicate differs between
``extract_links`` and the Document link pass.
"""

from __future__ import annotations

import re
from typing import Optional
from urllib.parse import urljoin, urlsplit, urlunsplit

from .dom import Node, parse_html

# combined unwanted-element selector — same element list as the
# reference's SELECTOR_CACHE["unwanted_elements"] (src/html_parser.rs:31-35)
UNWANTED_SELECTOR = (
    "script, style, iframe, noscript, .advertisement, .ad, .banner, "
    "#cookie-notice, header, footer, nav, .sidebar, .menu, .comments, "
    ".related, .share, .social"
)

MAIN_CONTENT_SELECTOR = "main, article, #content, .content"
_MAIN_FALLBACKS = ("main", "article", "#content", ".content", "body")


_UNWANTED_TAGS = frozenset(
    ["script", "style", "iframe", "noscript", "header", "footer", "nav"])
_UNWANTED_CLASSES = frozenset(
    ["advertisement", "ad", "banner", "sidebar", "menu", "comments",
     "related", "share", "social"])
_UNWANTED_IDS = frozenset(["cookie-notice"])


def clean_dom(root: Node) -> Node:
    """Remove unwanted elements from a parsed tree, in place.

    Set-membership fast path over one walk — exactly the element list of
    UNWANTED_SELECTOR (kept in sync; test asserts equivalence)."""
    doomed = []
    stack = list(reversed(root.children))
    while stack:
        node = stack.pop()
        if node.tag is None:
            continue
        if (node.tag in _UNWANTED_TAGS
                or node.attrs.get("id") in _UNWANTED_IDS
                or ("class" in node.attrs
                    and not _UNWANTED_CLASSES.isdisjoint(node.classes()))):
            doomed.append(node)
            continue  # children die with the subtree
        stack.extend(reversed(node.children))
    for node in doomed:
        node.detach()
    return root


def clean_html(html: str) -> str:
    """Parse, strip unwanted elements, re-serialize."""
    return clean_dom(parse_html(html)).to_html()


def extract_main_content(html: str) -> Node:
    """First match of the combined main-content selector, else the
    fallback chain main → article → #content → .content → body, else the
    whole document."""
    root = parse_html(html)
    el = root.select_one(MAIN_CONTENT_SELECTOR)
    if el is not None:
        return el
    for sel in _MAIN_FALLBACKS:
        el = root.select_one(sel)
        if el is not None:
            return el
    return root


def _norm_join(base_url: str, href: str) -> Optional[str]:
    """RFC-join ``href`` against ``base_url`` and normalize the way the
    Rust ``url`` crate's ``Url::to_string`` does: lowercase scheme+host,
    empty path on an authority URL becomes ``/``, default ports
    dropped; non-hierarchical absolute schemes (mailto:, tel:, …) pass
    through as-is (Url::join accepts them)."""
    try:
        joined = urljoin(base_url, href)
        parts = urlsplit(joined)
    except ValueError:
        return None
    if not parts.scheme:
        return None
    if not parts.netloc:
        # non-authority scheme like mailto:/tel: — valid absolute URL
        if parts.scheme.lower() in ("http", "https"):
            return None
        return joined
    netloc = parts.netloc.lower()
    scheme = parts.scheme.lower()
    if scheme == "http" and netloc.endswith(":80"):
        netloc = netloc[:-3]
    elif scheme == "https" and netloc.endswith(":443"):
        netloc = netloc[:-4]
    path = parts.path or "/"
    return urlunsplit((scheme, netloc, path, parts.query, parts.fragment))


def resolve_url_against_base(base_url: str, href: str) -> Optional[str]:
    """Link predicate used by the Document link/image passes
    (ref ``src/markdown_converter.rs:282-302``)."""
    href = href.strip()
    low = href.lower()
    if (
        not href
        or href.startswith("#")
        or low.startswith("javascript:")
        or low.startswith("data:")
        or " " in href
        or href.startswith(":")
        or ":::" in href
    ):
        return None
    return _norm_join(base_url, href)


def resolve_url(base_url: str, relative_url: str) -> str:
    """Absolute passthrough, else join (ref ``src/html_parser.rs:268-278``)."""
    if relative_url.startswith(("http://", "https://")):
        return relative_url
    resolved = _norm_join(base_url, relative_url)
    if resolved is None:
        raise ValueError(f"cannot resolve {relative_url!r} against {base_url!r}")
    return resolved


_TITLE_FAST_RE = re.compile(r"<title[^>]*>(.*?)</title>",
                            re.IGNORECASE | re.DOTALL)
_H1_FAST_RE = re.compile(r"<h1[^>]*>(.*?)</h1>", re.IGNORECASE | re.DOTALL)


def extract_title_fast(html: str) -> Optional[str]:
    """Regex title extraction without a full parse: ``<title>`` else
    first ``<h1>`` else None (ref ``core/converter.py:355-367``)."""
    for pattern in (_TITLE_FAST_RE, _H1_FAST_RE):
        if m := pattern.search(html):
            text = re.sub(r"<[^>]+>", "", m.group(1)).strip()
            if text:
                return text
    return None


def get_element_text(el: Node) -> str:
    """Join text nodes with single spaces, collapse whitespace."""
    parts = []
    stack = list(reversed(el.children))
    while stack:
        node = stack.pop()
        if node.tag is None:
            parts.append(node.text)
        else:
            stack.extend(reversed(node.children))
    return " ".join(" ".join(parts).split())


def extract_links(html: str, base_url: str) -> list[str]:
    """Unique absolute URLs from ``a[href]``, sorted
    (ref ``src/html_parser.rs:214-252``).

    Predicate here differs from the Document pass: only ``javascript:`` /
    ``#`` / empty are skipped, and already-absolute http(s) hrefs are
    passed through verbatim (no normalization).
    """
    root = parse_html(html)
    base_parts = urlsplit(base_url)
    if not base_parts.scheme:
        raise ValueError(f"invalid base url {base_url!r}")
    seen_order: list[str] = []
    for el in root.select("a[href]"):
        href = el.attrs.get("href", "")
        if not href or href.startswith(("javascript:", "#")):
            continue
        if href.startswith(("http://", "https://")):
            seen_order.append(href)
        else:
            resolved = _norm_join(base_url, href)
            if resolved is not None:
                seen_order.append(resolved)
    return sorted(set(seen_order))


def _el_text(el: Node) -> str:
    return el.text_content().strip()


_DOC_TAGS = frozenset(
    ["title", "p", "a", "img", "ul", "ol", "pre", "code", "blockquote",
     "h1", "h2", "h3", "h4", "h5", "h6"])


def _index_elements(root: Node) -> dict[str, list[Node]]:
    """ONE pre-order walk collecting the tags the Document needs, in
    document order (replaces 15 full-tree ``select`` walks — the same
    optimization as the reference's cached selectors, T6)."""
    index: dict[str, list[Node]] = {tag: [] for tag in _DOC_TAGS}
    index["__pre_code"] = []  # `pre, code` interleaved in document order
    stack = list(reversed(root.children))
    while stack:
        node = stack.pop()
        if node.tag is not None:
            bucket = index.get(node.tag)
            if bucket is not None:
                bucket.append(node)
                if node.tag in ("pre", "code"):
                    index["__pre_code"].append(node)
            stack.extend(reversed(node.children))
    return index


def parse_html_to_document(html: str, base_url: str) -> dict:
    """Full page → Document dict (ref ``src/markdown_converter.rs:76-94``).

    Key order matches the reference struct so JSON serialization is
    field-for-field identical.
    """
    parts = urlsplit(base_url)
    if not parts.scheme or not parts.netloc:
        raise ValueError(f"invalid base url {base_url!r}")

    root = clean_dom(parse_html(html))
    index = _index_elements(root)

    title_els = index["title"]
    title = (title_els[0].text_content() if title_els else "No Title").strip()

    doc = {
        "title": title,
        "base_url": base_url,
        "headings": [],
        "paragraphs": [],
        "links": [],
        "images": [],
        "lists": [],
        "code_blocks": [],
        "blockquotes": [],
    }

    # headings: by level, then document order within a level (quirk M6a)
    for level in range(1, 7):
        for el in index[f"h{level}"]:
            text = _el_text(el)
            if text:
                doc["headings"].append({"level": level, "text": text})

    for el in index["p"]:
        text = _el_text(el)
        if text:
            doc["paragraphs"].append(text)

    for el in index["a"]:
        if "href" not in el.attrs:
            continue
        text = _el_text(el)
        if text:
            url = resolve_url_against_base(base_url, el.attrs.get("href", ""))
            if url is not None:
                doc["links"].append({"text": text, "url": url})

    for el in index["img"]:
        if "src" not in el.attrs:
            continue
        src = resolve_url_against_base(base_url, el.attrs.get("src", ""))
        if src is not None:
            # "image" defaults only a MISSING alt; alt="" stays empty
            # (rust attr("alt").unwrap_or("image") keeps Some(""))
            doc["images"].append({"alt": el.attrs.get("alt", "image"),
                                  "src": src})

    # lists: every ul first, then every ol; items = descendant li (quirk M6e)
    for tag, ordered in (("ul", False), ("ol", True)):
        for lst in index[tag]:
            items = [t for li in lst.select("li") if (t := _el_text(li))]
            if items:
                doc["lists"].append({"ordered": ordered, "items": items})

    # code blocks: `pre, code` double-matches nested pairs (quirk M6f)
    for el in index["__pre_code"]:
        code = _el_text(el)
        if code:
            lang = next(
                (c[len("language-"):] for c in el.classes()
                 if c.startswith("language-")),
                "",
            )
            doc["code_blocks"].append({"language": lang, "code": code})

    for el in index["blockquote"]:
        text = _el_text(el)
        if text:
            doc["blockquotes"].append(text)

    return doc
