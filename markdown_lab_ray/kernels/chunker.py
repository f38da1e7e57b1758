"""RAG chunkers — both divergent reference rule-sets (SURVEY.md §7.5).

``chunk_markdown_char`` reproduces the Rust char-budget chunker
(ref ``src/chunker.rs:62-244``): line accumulation under a heading, one
split check per appended line, split points preferring paragraph break >
sentence break > newline > whitespace, and the exact semantic-density
formula (0.7·keywords + 0.5·TitleCase + 0.3·numeric over words, capped
1.0, + min(words/100, 0.2)).

``chunk_markdown_section`` reproduces the Python section-aware chunker
(ref ``markdown_lab/utils/chunk_utils.py:62-198``) including the
first-h2-under-h1 merge rule, the words-per-char ≈ 5 approximation and
md5 chunk ids.  ``create_semantic_chunks`` is the dispatching entry
(markdown-looking content → sections, else plain overlapping text
chunks, ref ``chunk_utils.py:229-290``).

Timestamps are injected (``now_iso``) so output is deterministic
(SURVEY.md §7.5: fixed clock).
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import urlparse

_HEADING_RE = re.compile(r"^(#{1,6})\s+(.+)$")
_PARA_BOUNDARY_RE = re.compile(r"\n\s*\n")
_SENT_BOUNDARY_RE = re.compile(r"[.!?]\s+")
_SEMANTIC_RE = re.compile(
    r"\b(function|class|method|algorithm|process|system|data|model|analysis"
    r"|implementation)\b",
    re.IGNORECASE,
)
_TITLECASE_RE = re.compile(r"\b[A-Z][a-z]+")
_NUMERIC_RE = re.compile(r"\b\w*\d+\w*\b")

FIXED_CLOCK_ISO = "1970-01-01T00:00:00"


def validate_chunk_params(chunk_size, chunk_overlap) -> None:
    """Same rules as the reference binding shim
    (ref ``markdown_lab/markdown_lab_rs.py:393-403``)."""
    if not isinstance(chunk_size, int) or not isinstance(chunk_overlap, int):
        raise TypeError("chunk_size and chunk_overlap must be integers")
    if chunk_size <= 0:
        raise ValueError("chunk_size must be positive")
    if chunk_overlap < 0:
        raise ValueError("chunk_overlap cannot be negative")
    if chunk_overlap >= chunk_size:
        raise ValueError("chunk_overlap must be less than chunk_size")


# ---------------------------------------------------------------------------
# char-budget chunker (Rust rule-set)
# ---------------------------------------------------------------------------

def _byte_to_char_index(text: str, byte_pos: int) -> int:
    """Char index corresponding to a UTF-8 byte offset (clamped onto the
    previous char boundary) — the reference computes split offsets in
    bytes; split points themselves land on ASCII whitespace so results
    agree on any text the regex boundaries match."""
    encoded = text.encode("utf-8")
    if byte_pos >= len(encoded):
        return len(text)
    return len(encoded[:byte_pos].decode("utf-8", errors="ignore"))


def _split_point(text: str, approx: int) -> int:
    """Best split position at/after ``approx``: paragraph break, then
    sentence break, then newline, then whitespace, else ``approx``."""
    if approx >= len(text):
        return len(text)
    tail = text[approx:]
    m = _PARA_BOUNDARY_RE.search(tail)
    if m:
        return approx + m.end()
    m = _SENT_BOUNDARY_RE.search(tail)
    if m:
        return approx + m.end()
    nl = tail.find("\n")
    if nl != -1:
        return approx + nl + 1
    for i, ch in enumerate(tail):
        if ch.isspace():
            return approx + i + 1
    return approx


def semantic_density(text: str) -> float:
    words = len(text.split())
    if words == 0:
        return 0.0
    score = (
        len(_SEMANTIC_RE.findall(text)) * 0.7
        + len(_TITLECASE_RE.findall(text)) * 0.5
        + len(_NUMERIC_RE.findall(text)) * 0.3
    )
    return min(score / words, 1.0) + min(words / 100.0, 0.2)


def _char_chunk(content: str, heading, level: int, position: int) -> dict:
    return {
        "content": content,
        "heading": heading,
        "level": level,
        "position": position,
        "word_count": len(content.split()),
        "char_count": len(content),
        "semantic_density": semantic_density(content),
    }


def chunk_markdown_char(markdown: str, chunk_size: int = 1000,
                        chunk_overlap: int = 200) -> list[dict]:
    """Char-budget chunking with metadata rows (Rust rule-set)."""
    validate_chunk_params(chunk_size, chunk_overlap)
    chunks: list[dict] = []
    current = ""
    heading = None
    level = 0
    position = 0

    for line in markdown.split("\n"):
        m = _HEADING_RE.match(line)
        if m:
            if current:
                chunks.append(_char_chunk(current, heading, level, position))
                position += 1
            heading = m.group(2)
            level = len(m.group(1))
            current = line
        else:
            current = f"{current}\n{line}" if current else line
            # the budget is measured in BYTES like the reference
            # (rust String::len); identical to chars for ASCII
            if len(current.encode("utf-8")) > chunk_size:
                approx = _byte_to_char_index(current,
                                             chunk_size - chunk_overlap)
                split = _split_point(current, approx)
                if split > 0:  # a 0-split would emit an empty chunk (the
                    # reference panics on this multibyte edge; we defer)
                    head, rest = current[:split], current[split:]
                    chunks.append(_char_chunk(head, heading, level,
                                              position))
                    position += 1
                    current = rest.strip()

    if current:
        chunks.append(_char_chunk(current, heading, level, position))
    return chunks


def chunk_markdown(markdown: str, chunk_size: int = 1000,
                   chunk_overlap: int = 200) -> list[str]:
    """Content-only convenience API (ref ``src/chunker.rs:62-72``)."""
    return [c["content"] for c in chunk_markdown_char(markdown, chunk_size,
                                                      chunk_overlap)]


# ---------------------------------------------------------------------------
# section-aware chunker (Python rule-set)
# ---------------------------------------------------------------------------

def _split_sections(markdown: str) -> list[tuple[str, str]]:
    """Split markdown into (heading_line, section_text) pairs with the
    reference's hierarchy rules, incl. first-h2-under-h1 merge."""
    sections: list[tuple[str, str]] = []
    section = ""
    heading = ""
    heading_level = 0
    merged_h2 = False

    for line in markdown.split("\n"):
        if not line.startswith("#"):
            section += line + "\n"
            continue
        level = len(line) - len(line.lstrip("#"))
        if heading_level == 0:
            heading, heading_level = line, level
            section = line + "\n"
            if level == 1:
                merged_h2 = False
        elif level == 1:
            if section:
                sections.append((heading, section))
            heading, heading_level = line, level
            section = line + "\n"
            merged_h2 = False
        elif level == 2:
            if heading_level == 1 and not merged_h2:
                section += line + "\n"
                merged_h2 = True
            else:
                if section:
                    sections.append((heading, section))
                heading, heading_level = line, level
                section = line + "\n"
        elif level > heading_level:
            section += line + "\n"
        else:
            if section:
                sections.append((heading, section))
            heading, heading_level = line, level
            section = line + "\n"
            if level == 1:
                merged_h2 = False

    if section:
        sections.append((heading, section))
    return sections


def _overlapping_word_chunks(text: str, chunk_size: int, chunk_overlap: int,
                             ratio: int):
    """Yield (start_word_index, chunk_text, n_words) for the reference's
    word-window split.

    Deviation from the reference (which raises ``range() arg 3 must not
    be zero`` / silently loses content at degenerate sizes): window and
    step are clamped to ≥1 word so no input text is ever dropped."""
    words = text.split()
    per_chunk = max(1, chunk_size // ratio)
    overlap = chunk_overlap // ratio
    step = per_chunk - overlap
    if step <= 0:
        step = max(per_chunk, 1)
    for i in range(0, len(words), step):
        piece = words[i:i + per_chunk]
        if piece:
            yield i, " ".join(piece), len(piece), i // step


def chunk_markdown_section(markdown: str, source_url: str,
                           chunk_size: int = 1000, chunk_overlap: int = 200,
                           ratio: int = 5,
                           now_iso: str = FIXED_CLOCK_ISO) -> list[dict]:
    """Section-aware chunk rows (Python rule-set)."""
    domain = urlparse(source_url).netloc
    chunks: list[dict] = []
    for heading, text in _split_sections(markdown):
        if len(text) <= chunk_size:
            cid = hashlib.md5(f"{source_url}:{heading}".encode()).hexdigest()
            chunks.append({
                "id": cid,
                "content": text,
                "heading": heading,
                "domain": domain,
                "position": None,
                "word_count": len(text.split()),
                "char_count": len(text),
                "source_url": source_url,
                "created_at": now_iso,
                "chunk_type": "section",
            })
        else:
            for i, piece, n_words, pos in _overlapping_word_chunks(
                    text, chunk_size, chunk_overlap, ratio):
                cid = hashlib.md5(
                    f"{source_url}:{heading}:{i}".encode()).hexdigest()
                chunks.append({
                    "id": cid,
                    "content": piece,
                    "heading": heading,
                    "domain": domain,
                    "position": pos,
                    "word_count": n_words,
                    "char_count": len(piece),
                    "source_url": source_url,
                    "created_at": now_iso,
                    "chunk_type": "content_chunk",
                })
    return chunks


def create_semantic_chunks(content: str, source_url: str,
                           chunk_size: int = 1000, chunk_overlap: int = 200,
                           ratio: int = 5,
                           now_iso: str = FIXED_CLOCK_ISO) -> list[dict]:
    """Dispatch: markdown-looking → section chunks, else text chunks."""
    if re.search(r"^#+ ", content, re.MULTILINE):
        return chunk_markdown_section(content, source_url, chunk_size,
                                      chunk_overlap, ratio, now_iso)
    domain = urlparse(source_url).netloc
    chunks = []
    for i, piece, n_words, pos in _overlapping_word_chunks(
            content, chunk_size, chunk_overlap, ratio):
        cid = hashlib.md5(f"{source_url}:text:{i}".encode()).hexdigest()
        chunks.append({
            "id": cid,
            "content": piece,
            "heading": None,
            "domain": domain,
            "position": pos,
            "word_count": n_words,
            "char_count": len(piece),
            "source_url": source_url,
            "created_at": now_iso,
            "chunk_type": "text_chunk",
        })
    return chunks
