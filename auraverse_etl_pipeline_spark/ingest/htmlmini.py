"""Tiny read-only HTML DOM on stdlib ``html.parser``.

The reference depends on BeautifulSoup for table introspection
(``etl_parser.py:448,695-697,1001-1013``); this container has no bs4, and
an executor-side pip dependency is a liability anyway, so the engine uses
this ~60-line subset: parse, descendant search by tag name, text
extraction. Lenient by construction — mismatched close tags pop to the
nearest matching ancestor; unknown tags nest normally.
"""

from __future__ import annotations

from html.parser import HTMLParser

#: HTML void elements — never pushed on the open-element stack.
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class Element:
    """One node: a tag (``name`` set) or a text node (``name is None``)."""

    __slots__ = ("name", "text", "children")

    def __init__(self, name: str | None = None, text: str = ""):
        self.name = name
        self.text = text
        self.children: list[Element] = []

    def walk(self):
        for child in self.children:
            yield child
            yield from child.walk()

    def first(self, tag: str) -> Element | None:
        for node in self.walk():
            if node.name == tag:
                return node
        return None

    def all(self, tags: str | tuple[str, ...]) -> list[Element]:
        wanted = (tags,) if isinstance(tags, str) else tuple(tags)
        return [n for n in self.walk() if n.name in wanted]

    def text_content(self, strip: bool = False) -> str:
        parts = (n.text for n in self.walk() if n.name is None)
        return "".join(p.strip() for p in parts) if strip else "".join(parts)


class _TreeBuilder(HTMLParser):
    def __init__(self, root: Element):
        super().__init__(convert_charrefs=True)
        self._open = [root]

    def handle_starttag(self, tag, attrs):
        node = Element(tag)
        self._open[-1].children.append(node)
        if tag not in _VOID:
            self._open.append(node)

    def handle_startendtag(self, tag, attrs):
        self._open[-1].children.append(Element(tag))

    def handle_endtag(self, tag):
        for depth in range(len(self._open) - 1, 0, -1):
            if self._open[depth].name == tag:
                del self._open[depth:]
                return
        # stray close tag: ignore

    def handle_data(self, data):
        self._open[-1].children.append(Element(text=data))


def parse_html(markup: str) -> Element:
    root = Element(name="#document")
    builder = _TreeBuilder(root)
    builder.feed(markup)
    builder.close()
    return root
