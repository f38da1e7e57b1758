"""Regex-based HTML→Markdown converter — the reference's pure-Python
fallback path (M12, ref ``markdown_lab/markdown_lab_rs.py:20-156``),
kept as an alternate backend / test oracle (SURVEY §2.10: "keep the
pure-Python reference fns as test oracles").

Pipeline: entity-decode → strip script/style → ``<title>`` → ``# ``,
h1–h3, ``<pre><code>`` → fence, ``<p>``, links+images (urljoin),
blockquotes, ``<li>`` → ``- ``, strip remaining tags, collapse blanks.
"""

from __future__ import annotations

import html as html_module
import re
from urllib.parse import urljoin

_SCRIPT_STYLE_RE = re.compile(r"<(script|style)[^>]*>.*?</\1>",
                              re.DOTALL | re.IGNORECASE)
_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title>", re.IGNORECASE)
_TITLE_STRIP_RE = re.compile(r"<title[^>]*>.*?</title>", re.IGNORECASE)
_H_RES = [
    (re.compile(r"<h1[^>]*>(.*?)</h1>", re.IGNORECASE), r"# \1\n\n"),
    (re.compile(r"<h2[^>]*>(.*?)</h2>", re.IGNORECASE), r"## \1\n\n"),
    (re.compile(r"<h3[^>]*>(.*?)</h3>", re.IGNORECASE), r"### \1\n\n"),
]
_PRE_CODE_RE = re.compile(r"<pre[^>]*>\s*<code[^>]*>([\s\S]*?)</code>\s*</pre>",
                          re.IGNORECASE)
_P_RE = re.compile(r"<p[^>]*>(.*?)</p>", re.DOTALL | re.IGNORECASE)
_A_RE = re.compile(r'<a[^>]*href=["\']([^"\']*)["\'][^>]*>(.*?)</a>',
                   re.IGNORECASE)
_IMG_ALT_RE = re.compile(
    r'<img[^>]*src=["\']([^"\']*)["\'][^>]*alt=["\']([^"\']*)["\'][^>]*>',
    re.IGNORECASE)
_IMG_RE = re.compile(r'<img[^>]*src=["\']([^"\']*)["\'][^>]*>', re.IGNORECASE)
_BLOCKQUOTE_RE = re.compile(r"<blockquote[^>]*>([\s\S]*?)</blockquote>",
                            re.IGNORECASE)
_LI_RE = re.compile(r"<li[^>]*>(.*?)</li>", re.IGNORECASE)
_LIST_TAG_RE = re.compile(r"</?[uo]l[^>]*>", re.IGNORECASE)
_TAG_RE = re.compile(r"<[^>]+>")
_BLANK_RE = re.compile(r"\n\s*\n")


def fallback_html_to_markdown(html: str, base_url: str = "") -> str:
    try:
        html = html_module.unescape(html)
    except Exception:
        pass
    html = _SCRIPT_STYLE_RE.sub("", html)

    title = ""
    if m := _TITLE_RE.search(html):
        title = f"# {m.group(1).strip()}\n\n"
    html = _TITLE_STRIP_RE.sub("", html)

    for pattern, repl in _H_RES:
        html = pattern.sub(repl, html)

    def code_block(m: re.Match) -> str:
        code = m.group(1).replace("\r\n", "\n").replace("\r", "\n")
        return f"\n```\n{code}\n```\n\n"

    html = _PRE_CODE_RE.sub(code_block, html)
    html = _P_RE.sub(r"\1\n\n", html)

    def link(m: re.Match) -> str:
        href, text = m.group(1), m.group(2)
        try:
            absolute = urljoin(base_url, href) if base_url else href
        except Exception:
            absolute = href
        return f"[{text}]({absolute})"

    html = _A_RE.sub(link, html)

    def img(alt_group):
        def repl(m: re.Match) -> str:
            src = m.group(1)
            alt = m.group(2) if alt_group else ""
            try:
                absolute = urljoin(base_url, src) if base_url else src
            except Exception:
                absolute = src
            return f"![{alt}]({absolute})"
        return repl

    html = _IMG_ALT_RE.sub(img(True), html)
    html = _IMG_RE.sub(img(False), html)

    def blockquote(m: re.Match) -> str:
        inner = _TAG_RE.sub("", m.group(1))
        lines = [ln.strip() for ln in inner.splitlines() if ln.strip()]
        if not lines:
            return ""
        return "\n" + "\n".join("> " + ln for ln in lines) + "\n\n"

    html = _BLOCKQUOTE_RE.sub(blockquote, html)
    html = _LI_RE.sub(r"- \1\n", html)
    html = _LIST_TAG_RE.sub("", html)
    html = _TAG_RE.sub("", html)
    html = _BLANK_RE.sub("\n\n", html)
    return title + html.strip()
