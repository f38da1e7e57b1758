"""Markdown → Document fallback parser (M13).

Reference: ``markdown_lab/markdown_lab_rs.py:255-331`` — a simplified
line parser used when JSON/XML must be produced from markdown (and for
corpus queries over ``documents.text``): title = first ``# `` line,
headings, fenced code blocks, ``>`` blockquotes, everything else that
is non-blank becomes a paragraph.
"""

from __future__ import annotations


def parse_markdown_to_document(markdown: str, base_url: str = "") -> dict:
    doc = {
        "title": "No Title",
        "base_url": base_url,
        "headings": [],
        "paragraphs": [],
        "links": [],
        "images": [],
        "lists": [],
        "code_blocks": [],
        "blockquotes": [],
    }
    lines = markdown.split("\n")
    for line in lines:
        if line.startswith("# "):
            doc["title"] = line[2:].strip()
            break

    in_code = False
    code_lang = ""
    code_lines: list[str] = []
    for line in lines:
        if line.strip() == f"# {doc['title']}":
            continue
        if line.startswith("#") and not in_code:
            level = len(line) - len(line.lstrip("#"))
            if level <= 6 and level < len(line) and line[level] == " ":
                doc["headings"].append(
                    {"level": level, "text": line[level + 1:].strip()})
        elif line.startswith("```") and not in_code:
            in_code = True
            code_lang = line[3:].strip()
            code_lines = []
        elif line.startswith("```") and in_code:
            in_code = False
            doc["code_blocks"].append(
                {"language": code_lang, "code": "\n".join(code_lines)})
            code_lines = []
        elif in_code:
            code_lines.append(line)
        elif line.startswith(">"):
            doc["blockquotes"].append(line[1:].strip())
        elif line.strip():
            doc["paragraphs"].append(line.strip())
    return doc
