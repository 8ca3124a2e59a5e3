"""Serializer with golang.org/x/net/html Render() byte semantics.

The reference's rich_content and the intermediate article HTML round-trip through
x/net/html's renderer (goquery Selection.Html()), so byte parity of our output
depends on matching its exact escaping rules:
  text nodes / attribute values escape & ' < > " (and \r in attrs) to
  &amp; &#39; &lt; &gt; &#34; &#13;   (x/net/html escape.go escape())
  void elements serialize as <br/>, raw-text element children serialize literally,
  and pre/listing/textarea re-emit a leading newline (x/net/html render.go).
"""

from __future__ import annotations

from .node import (
    COMMENT_NODE,
    DOCTYPE_NODE,
    DOCUMENT_NODE,
    ELEMENT_NODE,
    TEXT_NODE,
    Node,
)
from .parser import RAW_TEXT, VOID_ELEMENTS

_ESCAPES = {
    "&": "&amp;",
    "'": "&#39;",
    "<": "&lt;",
    ">": "&gt;",
    '"': "&#34;",
    "\r": "&#13;",
}

_text_trans = str.maketrans(_ESCAPES)

# x/net/html render.go childTextNodesAreLiteral tags
_LITERAL_CHILD_TAGS = RAW_TEXT


import re as _re

_ESC_RE = _re.compile(r"[&'<>\"\r]")


def escape_text(s: str) -> str:
    # x/net/html escapes the same set in text and attributes
    if _ESC_RE.search(s) is not None:
        return s.translate(_text_trans)
    return s


def render(n: Node, out: list) -> None:
    t = n.type
    if t == TEXT_NODE:
        out.append(escape_text(n.data))
        return
    if t == DOCUMENT_NODE:
        c = n.first_child
        while c is not None:
            render(c, out)
            c = c.next_sibling
        return
    if t == COMMENT_NODE:
        out.append("<!--")
        out.append(n.data)
        out.append("-->")
        return
    if t == DOCTYPE_NODE:
        out.append("<!DOCTYPE ")
        out.append(n.data)
        out.append(">")
        return
    if t != ELEMENT_NODE:
        return

    out.append("<")
    out.append(n.data)
    for k, v in n.attrs:
        out.append(" ")
        out.append(k)
        out.append('="')
        out.append(escape_text(v))
        out.append('"')
    if n.data in VOID_ELEMENTS:
        # x/net/html renders void elements with a trailing slash
        out.append("/>")
        return
    out.append(">")

    # x/net/html: re-add a leading newline that parsing would ignore
    c = n.first_child
    if c is not None and c.type == TEXT_NODE and c.data.startswith("\n"):
        if n.data in ("pre", "listing", "textarea"):
            out.append("\n")

    if n.data in _LITERAL_CHILD_TAGS:
        c = n.first_child
        while c is not None:
            if c.type == TEXT_NODE:
                out.append(c.data)
            else:
                render(c, out)
            c = c.next_sibling
    else:
        c = n.first_child
        while c is not None:
            render(c, out)
            c = c.next_sibling

    out.append("</")
    out.append(n.data)
    out.append(">")


def outer_html(n: Node) -> str:
    out: list = []
    render(n, out)
    return "".join(out)


def inner_html(n: Node) -> str:
    """goquery Selection.Html(): rendered concatenation of child nodes."""
    out: list = []
    c = n.first_child
    while c is not None:
        render(c, out)
        c = c.next_sibling
    return "".join(out)
