"""Document → Markdown / JSON / XML serialization + formatter post-pass.

Parity targets:

- ``document_to_markdown``: byte-level match with the reference's fixed
  section order and blank-line collapse (ref
  ``src/markdown_converter.rs:326-388``).  This output is the canonical
  text the chunkers consume.
- ``document_to_json``: 2-space pretty JSON in struct field order (ref
  ``src/markdown_converter.rs:391-395``).
- ``document_to_xml``: the Python-fallback shape the reference's
  integration tests assert — ``<Document>`` root, heading ``level``
  attribute, minidom pretty-print (ref
  ``markdown_lab/markdown_lab_rs.py:334-375``,
  ``tests/integration/test_comprehensive.py:131-134``) — extended to
  cover every Document field.
- formatter metadata injection (ref ``markdown_lab/formats/``) with an
  injectable fixed clock so outputs stay deterministic.
"""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET
from typing import Optional
from xml.dom import minidom

VALID_FORMATS = ("markdown", "json", "xml")


def normalize_format(fmt: Optional[str]) -> str:
    """Lowercase + whitelist, falling back to markdown
    (ref ``markdown_lab/core/scraper.py:864-876``)."""
    value = (fmt or "markdown").lower()
    return value if value in VALID_FORMATS else "markdown"


def document_to_markdown(doc: dict) -> str:
    out = [f"# {doc['title']}\n\n"]

    for h in doc["headings"]:
        out.append(f"{'#' * int(h['level'])} {h['text']}\n\n")

    for p in doc["paragraphs"]:
        out.append(f"{p}\n\n")

    for link in doc["links"]:
        out.append(f"[{link['text']}]({link['url']})\n\n")

    for img in doc["images"]:
        out.append(f"![{img['alt']}]({img['src']})\n\n")

    for lst in doc["lists"]:
        if lst["ordered"]:
            out.extend(f"{i}. {item}\n" for i, item in enumerate(lst["items"], 1))
        else:
            out.extend(f"- {item}\n" for item in lst["items"])
        out.append("\n")

    for cb in doc["code_blocks"]:
        out.append(f"```{cb['language']}\n{cb['code']}\n```\n\n")

    for quote in doc["blockquotes"]:
        quoted = "\n".join(f"> {line}" for line in quote.splitlines())
        out.append(f"{quoted}\n\n")

    text = "".join(out)
    # same blank-line collapse chain as the reference
    return text.replace("\n\n\n\n", "\n\n").replace("\n\n\n", "\n\n").strip()


def document_to_json(doc: dict) -> str:
    return json.dumps(doc, indent=2, ensure_ascii=False)


def document_to_xml(doc: dict) -> str:
    root = ET.Element("Document")

    ET.SubElement(root, "title").text = doc["title"]
    ET.SubElement(root, "base_url").text = doc["base_url"]

    headings = ET.SubElement(root, "headings")
    for h in doc["headings"]:
        el = ET.SubElement(headings, "heading")
        el.set("level", str(h["level"]))
        el.text = h["text"]

    paragraphs = ET.SubElement(root, "paragraphs")
    for p in doc["paragraphs"]:
        ET.SubElement(paragraphs, "paragraph").text = p

    links = ET.SubElement(root, "links")
    for link in doc["links"]:
        el = ET.SubElement(links, "link")
        el.set("url", link["url"])
        el.text = link["text"]

    images = ET.SubElement(root, "images")
    for img in doc["images"]:
        el = ET.SubElement(images, "image")
        el.set("src", img["src"])
        el.set("alt", img["alt"])

    lists = ET.SubElement(root, "lists")
    for lst in doc["lists"]:
        el = ET.SubElement(lists, "list")
        el.set("ordered", "true" if lst["ordered"] else "false")
        for item in lst["items"]:
            ET.SubElement(el, "item").text = item

    code_blocks = ET.SubElement(root, "code_blocks")
    for cb in doc["code_blocks"]:
        el = ET.SubElement(code_blocks, "code_block")
        el.set("language", cb["language"])
        el.text = cb["code"]

    blockquotes = ET.SubElement(root, "blockquotes")
    for quote in doc["blockquotes"]:
        ET.SubElement(blockquotes, "blockquote").text = quote

    rough = ET.tostring(root, "utf-8")
    return minidom.parseString(rough).toprettyxml(indent="  ")


def render_document(doc: dict, fmt: str) -> str:
    fmt = normalize_format(fmt)
    if fmt == "json":
        return document_to_json(doc)
    if fmt == "xml":
        return document_to_xml(doc)
    return document_to_markdown(doc)


# ---------------------------------------------------------------------------
# formatter post-pass (metadata injection) — ref markdown_lab/formats/
# ---------------------------------------------------------------------------

def format_markdown(content: str, metadata: Optional[dict] = None,
                    include_metadata: bool = True) -> str:
    if not content or not content.strip():
        return ""
    if not (include_metadata and metadata):
        return content
    header = []
    if metadata.get("title"):
        header.append(f"# {metadata['title']}")
    if metadata.get("source_url"):
        header.append(f"\n*Source: {metadata['source_url']}*")
    if metadata.get("generated_at"):
        header.append(f"*Generated: {metadata['generated_at']}*")
    if header:
        return "\n".join(header) + "\n\n" + content
    return content


def format_json(content: str, metadata: Optional[dict] = None,
                include_metadata: bool = True, indent: int = 2) -> str:
    if not content or not content.strip():
        return "{}"
    try:
        data = json.loads(content)
    except json.JSONDecodeError as exc:
        wrapped = {"content": content,
                   "error": f"Invalid JSON from converter: {exc}"}
        if metadata:
            wrapped["metadata"] = metadata
        return json.dumps(wrapped, indent=2, ensure_ascii=False)
    if include_metadata and metadata:
        data["metadata"] = {
            "title": metadata.get("title"),
            "source_url": metadata.get("source_url"),
            "generated_at": metadata.get("generated_at"),
            "format": "json",
        }
    return json.dumps(data, indent=indent, ensure_ascii=False)


def format_xml(content: str, metadata: Optional[dict] = None,
               include_metadata: bool = True) -> str:
    if not content or not content.strip():
        return '<?xml version="1.0" encoding="UTF-8"?>\n<document></document>'
    try:
        root = ET.fromstring(content)
    except ET.ParseError as exc:
        root = ET.Element("document")
        ET.SubElement(root, "error").text = f"Invalid XML from converter: {exc}"
        ET.SubElement(root, "raw_content").text = content
        if metadata:
            meta = ET.SubElement(root, "metadata")
            for key, value in metadata.items():
                if value:
                    ET.SubElement(meta, key).text = str(value)
        return _pretty_xml(root)
    if include_metadata and metadata:
        meta = ET.SubElement(root, "metadata")
        for key in ("title", "source_url", "generated_at"):
            if metadata.get(key):
                ET.SubElement(meta, key).text = str(metadata[key])
        ET.SubElement(meta, "format").text = "xml"
    return _pretty_xml(root)


def _pretty_xml(root: ET.Element) -> str:
    rough = ET.tostring(root, encoding="unicode")
    pretty = minidom.parseString(rough).toprettyxml(indent="  ", encoding=None)
    return "\n".join(line for line in pretty.split("\n") if line.strip())


FORMATTERS = {
    "markdown": format_markdown,
    "json": format_json,
    "xml": format_xml,
}

FILE_EXTENSIONS = {"markdown": ".md", "json": ".json", "xml": ".xml"}
