"""A minimal HTML DOM + simple-selector engine on stdlib ``html.parser``.

The reference parses HTML with the Rust ``scraper`` crate (html5ever).
This sandbox has no lxml/selectolax, so we build the small subset of DOM
behavior the reference's kernels actually rely on
(``/root/reference/src/html_parser.rs``, ``src/markdown_converter.rs``):

- pre-order document traversal,
- simple selectors: ``tag``, ``#id``, ``.class``, ``[attr]``, compounds
  like ``a[href]`` and comma groups like ``main, article, #content`` —
  the reference uses no combinators,
- descendant-scoped selection from any element,
- text extraction = concatenation of descendant text nodes
  (no separator), entities already decoded by the parser.

Error recovery is intentionally simple (void elements, implied closes
for a few tags, stray end tags ignored); the synthetic corpus and the
reference's fixtures are near-well-formed.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator, Optional

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# tags whose open implicitly closes a same-name (or listed) open element
_IMPLIED_CLOSE = {
    "li": {"li"},
    "p": {"p"},
    "tr": {"tr", "td", "th"},
    "td": {"td", "th"},
    "th": {"td", "th"},
    "option": {"option"},
}

# block-level tags that implicitly close an open <p> (HTML5 spec behavior,
# matches html5ever's tree construction for the cases the kernels rely on)
_P_CLOSERS = frozenset(
    "address article aside blockquote details div dl fieldset figcaption "
    "figure footer form h1 h2 h3 h4 h5 h6 header hr main menu nav ol p pre "
    "section table ul".split()
)

class Node:
    """Element or text node. Text nodes have ``tag is None``."""

    __slots__ = ("tag", "attrs", "children", "parent", "text")

    def __init__(self, tag: Optional[str], attrs: Optional[dict] = None,
                 text: str = ""):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list[Node] = []
        self.parent: Optional[Node] = None
        self.text = text  # only for text nodes

    # -- tree ops ---------------------------------------------------------
    def append(self, node: "Node") -> None:
        node.parent = self
        self.children.append(node)

    def detach(self) -> None:
        if self.parent is not None:
            self.parent.children.remove(self)
            self.parent = None

    def iter_elements(self, include_self: bool = False) -> Iterator["Node"]:
        """Pre-order traversal over element nodes."""
        if include_self and self.tag is not None:
            yield self
        stack = list(reversed(self.children))
        while stack:
            node = stack.pop()
            if node.tag is not None:
                yield node
                stack.extend(reversed(node.children))

    # -- text -------------------------------------------------------------
    def text_content(self) -> str:
        """All descendant text concatenated with no separator
        (scraper ``element.text().collect::<String>()`` semantics)."""
        parts: list[str] = []
        stack = list(reversed(self.children))
        if self.tag is None:
            return self.text
        while stack:
            node = stack.pop()
            if node.tag is None:
                parts.append(node.text)
            else:
                stack.extend(reversed(node.children))
        return "".join(parts)

    def classes(self) -> list[str]:
        return self.attrs.get("class", "").split()

    # -- selection --------------------------------------------------------
    def select(self, selector: str) -> list["Node"]:
        """Descendant elements matching a simple selector group,
        in document (pre-order) order."""
        compounds = parse_selector(selector)
        return [el for el in self.iter_elements()
                if any(_matches(el, c) for c in compounds)]

    def select_one(self, selector: str) -> Optional["Node"]:
        compounds = parse_selector(selector)
        for el in self.iter_elements():
            if any(_matches(el, c) for c in compounds):
                return el
        return None

    # -- serialization (debug / tests) ------------------------------------
    def to_html(self) -> str:
        from html import escape
        if self.tag is None:
            return escape(self.text, quote=False)
        if self.tag == "#document":
            return "".join(c.to_html() for c in self.children)
        attrs = "".join(
            f' {k}="{escape(str(v))}"' for k, v in self.attrs.items()
        )
        if self.tag in VOID_ELEMENTS:
            return f"<{self.tag}{attrs}>"
        inner = "".join(c.to_html() for c in self.children)
        return f"<{self.tag}{attrs}>{inner}</{self.tag}>"

    def __repr__(self) -> str:  # pragma: no cover
        if self.tag is None:
            return f"Text({self.text!r})"
        return f"<{self.tag} {self.attrs}>"


class _Compound:
    __slots__ = ("tag", "id", "classes", "attrs")

    def __init__(self, tag=None, id_=None, classes=(), attrs=()):
        self.tag = tag
        self.id = id_
        self.classes = tuple(classes)
        self.attrs = tuple(attrs)


def parse_selector(selector: str) -> list[_Compound]:
    """Parse a comma group of compound simple selectors."""
    out = []
    for part in selector.split(","):
        part = part.strip()
        if not part:
            continue
        tag = None
        id_ = None
        classes = []
        attrs = []
        i = 0
        token = ""
        mode = "tag"
        part += "\0"  # sentinel
        while i < len(part):
            ch = part[i]
            if ch in "#.[\0":
                if token:
                    if mode == "tag":
                        tag = token.lower()
                    elif mode == "id":
                        id_ = token
                    elif mode == "class":
                        classes.append(token)
                token = ""
                if ch == "#":
                    mode = "id"
                elif ch == ".":
                    mode = "class"
                elif ch == "[":
                    j = part.index("]", i)
                    attrs.append(part[i + 1:j].strip().lower())
                    i = j
                    mode = "none"
            else:
                token += ch
            i += 1
        out.append(_Compound(tag, id_, classes, attrs))
    return out


def _matches(el: Node, c: _Compound) -> bool:
    if c.tag is not None and el.tag != c.tag:
        return False
    if c.id is not None and el.attrs.get("id") != c.id:
        return False
    if c.classes:
        el_classes = el.classes()
        if any(cls not in el_classes for cls in c.classes):
            return False
    return all(a in el.attrs for a in c.attrs)


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#document")
        self.stack = [self.root]

    # the open element we are inside
    @property
    def top(self) -> Node:
        return self.stack[-1]

    @staticmethod
    def _attr_dict(attrs) -> dict:
        # first occurrence wins, case-insensitively (HTML5 behavior)
        out = {}
        for k, v in attrs:
            k = k.lower()
            if k not in out:
                out[k] = v if v is not None else ""
        return out

    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        if tag in _P_CLOSERS and self.top.tag == "p":
            self.stack.pop()
        implied = _IMPLIED_CLOSE.get(tag)
        if implied:
            # close the nearest same-kind open element, if it is on top
            for open_tag in implied:
                if self.top.tag == open_tag:
                    self.stack.pop()
                    break
        node = Node(tag, self._attr_dict(attrs))
        self.top.append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        # html5ever ignores the self-closing flag on non-void HTML
        # elements (<div/> OPENS a div); mirror that so following
        # content lands inside the element (e.g. a self-closed .ad div
        # still swallows — and gets cleaned with — its trailing text)
        self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag):
        tag = tag.lower()
        # find the nearest matching open element; ignore stray end tags
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.top.append(Node(None, text=data))


def parse_html(html: str) -> Node:
    """Parse an HTML string into a document node."""
    builder = _TreeBuilder()
    try:
        builder.feed(html)
        builder.close()
    except Exception:
        # tolerate malformed input — keep whatever tree was built
        pass
    return builder.root
