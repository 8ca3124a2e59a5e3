"""goquery-equivalent traversal helpers over the cascadia-parity selector engine.

Implements what the reference exercises: Find(selector) in document pre-order
(goquery/cascadia), Text() (concatenated text-node data, recursing into
children even of converted text nodes — goquery utilities.go getNodeText),
Siblings()+Union ordering (siblings in document order, self appended last —
goquery expand.go / the order getArticle depends on,
vendor/.../go-readability/readability.go:185).

Selector grammar/matching live in htmldom/selector.py (full cascadia parity:
attribute selectors, +/~ combinators, :nth-* and the rest). Invalid selectors
match NOTHING, mirroring goquery's invalidMatcher (goquery type.go:166-176) —
a bad per-site rule thereby falls back to the general parser like the
reference does.
"""

from __future__ import annotations

from .gostr import utf8_len
from .node import ELEMENT_NODE, TEXT_NODE, Node
from .selector import SelectorError, _Group, _NeverMatch, _TagSel, parse_group

_NEVER = _Group([_NeverMatch()])

_SELECTOR_CACHE: dict = {}


def compile_selector(sel: str):
    """Compile a selector group (memoized).

    Invalid selectors compile to a never-matching group — goquery
    compileMatcher semantics (type.go:166-176), not an exception.
    """
    cached = _SELECTOR_CACHE.get(sel)
    if cached is not None:
        return cached
    try:
        group = parse_group(sel)
    except SelectorError:
        group = _NEVER
    if len(_SELECTOR_CACHE) < 4096:
        _SELECTOR_CACHE[sel] = group
    return group


def _iter_descendants(root: Node):
    """Pre-order descendants of root (excluding root)."""
    out = []
    node = root.first_child
    while node is not None and node is not root:
        out.append(node)
        if node.first_child is not None:
            node = node.first_child
            continue
        while node is not None and node is not root and node.next_sibling is None:
            node = node.parent
        if node is None or node is root:
            break
        node = node.next_sibling
    return out


_TAG_ONLY_CACHE: dict = {}


def _tag_only_set(group, key):
    """If every group member is a plain tag selector, return the tag set."""
    if key in _TAG_ONLY_CACHE:
        return _TAG_ONLY_CACHE[key]
    tags = set()
    for sel in group.sels:
        if type(sel) is not _TagSel:
            tags = None
            break
        tags.add(sel.tag)
    if len(_TAG_ONLY_CACHE) < 4096:
        _TAG_ONLY_CACHE[key] = tags
    return tags


def find_all(root: Node, selector) -> list:
    """goquery Find(): matching element descendants, document order, snapshot."""
    if isinstance(selector, str):
        group = compile_selector(selector)
        tags = _tag_only_set(group, selector)
    else:
        group = selector
        tags = None
    if tags is not None:
        # fast path: plain tag-set selectors ("p,td", "div", "script,style,…")
        return [
            n for n in _iter_descendants(root)
            if n.type == ELEMENT_NODE and n.data in tags
        ]
    match = group.match
    return [n for n in _iter_descendants(root) if match(n)]


def find_elements(root: Node) -> list:
    """Find("*"): all element descendants, document order, snapshot."""
    return [n for n in _iter_descendants(root) if n.type == ELEMENT_NODE]


def node_text(n: Node) -> str:
    """goquery Selection.Text() over a single node.

    Mirrors goquery utilities.go: appends Data for text nodes and recurses into
    first_child chains even when the node is a text node (relevant after the
    sanitize walk converts elements to text nodes in place).
    """
    buf = []
    stack = [n]
    while stack:
        nd = stack.pop()
        if nd.type == TEXT_NODE:
            buf.append(nd.data)
        c = nd.first_child
        if c is not None:
            kids = []
            while c is not None:
                kids.append(c)
                c = c.next_sibling
            stack.extend(reversed(kids))
    return "".join(buf)


def count_descendant_tags(n: Node, tags) -> dict:
    """Count element descendants by tag in one walk (Find(tag).Length())."""
    counts = dict.fromkeys(tags, 0)
    walk = [n]
    while walk:
        nd = walk.pop()
        c = nd.first_child
        while c is not None:
            if c.type == ELEMENT_NODE:
                if c.data in counts:
                    counts[c.data] += 1
                walk.append(c)
            elif c.first_child is not None:
                walk.append(c)
            c = c.next_sibling
    return counts


def link_and_text_bytes(n: Node) -> tuple:
    """(text bytes under <a> descendants ×nesting multiplicity, total text bytes).

    Matches goquery s.Find("a").Text() + s.Text() in one walk: a text node under
    k nested <a> descendants is counted k times in the link total
    (go-readability readability.go:306-314; UTF-8 byte semantics).
    """
    link = 0
    total = 0
    stack = [(n, 0)]  # Find("a") matches strict descendants: root's tag ignored
    while stack:
        nd, a_depth = stack.pop()
        if nd.type == TEXT_NODE and nd.data:
            b = utf8_len(nd.data)
            total += b
            if a_depth:
                link += b * a_depth
        c = nd.first_child
        if c is not None:
            child_depth = a_depth + (
                1 if (nd is not n and nd.type == ELEMENT_NODE and nd.data == "a") else 0
            )
            kids = []
            while c is not None:
                kids.append(c)
                c = c.next_sibling
            for k in reversed(kids):
                stack.append((k, child_depth))
    return link, total


def siblings_then_self(n: Node) -> list:
    """goquery Siblings().Union(self): siblings in document order, then self.

    Union dedups while preserving first-seen order; since Siblings() excludes
    self, self always lands last (go-readability readability.go:185).
    """
    out = []
    p = n.parent
    if p is not None:
        c = p.first_child
        while c is not None:
            if c is not n and c.type == ELEMENT_NODE:
                out.append(c)
            c = c.next_sibling
    out.append(n)
    return out
