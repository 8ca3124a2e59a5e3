"""goquery-equivalent traversal helpers and a small CSS selector engine.

Implements the exact subset the reference exercises: Find(selector) in document
pre-order (goquery/cascadia), Text() (concatenated text-node data, recursing into
children even of converted text nodes — goquery utilities.go getNodeText),
Siblings()+Union ordering (siblings in document order, self appended last —
goquery expand.go / the order getArticle depends on,
vendor/.../go-readability/readability.go:185).

Selector support: tag, #id, .class, compounds (tag#id.cls), descendant (space),
child (>), and comma groups — covers per-domain rules like ".content p" and
"#content p, .post-title" (reference readability_test.go:205,347).
"""

from __future__ import annotations

from .gostr import utf8_len
from .node import ELEMENT_NODE, TEXT_NODE, Node

# ---------------------------------------------------------------------------
# CSS selector subset
# ---------------------------------------------------------------------------


class _Simple:
    __slots__ = ("tag", "id", "classes")

    def __init__(self, tag=None, id_=None, classes=None):
        self.tag = tag
        self.id = id_
        self.classes = classes or []

    def matches(self, n: Node) -> bool:
        if n.type != ELEMENT_NODE:
            return False
        if self.tag is not None and n.data != self.tag:
            return False
        if self.id is not None and n.get_attr("id") != self.id:
            return False
        if self.classes:
            cls = n.get_attr("class")
            if cls is None:
                return False
            have = cls.split()
            for c in self.classes:
                if c not in have:
                    return False
        return True


class _Chain:
    """Compound selector chain: [( combinator, _Simple ), ...] left-to-right.

    combinator: ' ' descendant, '>' child; first entry's combinator is ignored.
    """

    __slots__ = ("parts",)

    def __init__(self, parts):
        self.parts = parts

    def matches(self, n: Node) -> bool:
        idx = len(self.parts) - 1
        if not self.parts[idx][1].matches(n):
            return False
        node = n
        idx -= 1
        while idx >= 0:
            comb = self.parts[idx + 1][0]
            simple = self.parts[idx][1]
            if comb == ">":
                node = node.parent
                if node is None or not simple.matches(node):
                    return False
            else:  # descendant
                node = node.parent
                while node is not None and not simple.matches(node):
                    node = node.parent
                if node is None:
                    return False
            idx -= 1
        return True


def _parse_simple(tok: str) -> _Simple:
    tag = None
    id_ = None
    classes = []
    i = 0
    n = len(tok)
    # leading tag or '*'
    j = i
    while j < n and tok[j] not in "#.":
        j += 1
    if j > i:
        t = tok[i:j].lower()
        if t != "*":
            tag = t
    i = j
    while i < n:
        marker = tok[i]
        i += 1
        j = i
        while j < n and tok[j] not in "#.":
            j += 1
        name = tok[i:j]
        if marker == "#":
            id_ = name
        else:
            classes.append(name)
        i = j
    return _Simple(tag, id_, classes)


_SELECTOR_CACHE: dict = {}


def compile_selector(sel: str):
    """Compile a selector group into a list of _Chain (memoized)."""
    cached = _SELECTOR_CACHE.get(sel)
    if cached is not None:
        return cached
    chains = _compile_selector_uncached(sel)
    if len(_SELECTOR_CACHE) < 4096:
        _SELECTOR_CACHE[sel] = chains
    return chains


def _compile_selector_uncached(sel: str):
    chains = []
    for group in sel.split(","):
        group = group.strip()
        if not group:
            continue
        # normalize child combinator spacing
        group = group.replace(">", " > ")
        toks = group.split()
        parts = []
        comb = " "
        for tok in toks:
            if tok == ">":
                comb = ">"
                continue
            parts.append((comb, _parse_simple(tok)))
            comb = " "
        if parts:
            chains.append(_Chain(parts))
    return chains


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


def _tag_only_set(chains, key):
    """If every chain is a single tag-only simple selector, return the tag set."""
    if key in _TAG_ONLY_CACHE:
        return _TAG_ONLY_CACHE[key]
    tags = set()
    for ch in chains:
        if len(ch.parts) != 1:
            tags = None
            break
        simple = ch.parts[0][1]
        if simple.tag is None or simple.id is not None or simple.classes:
            tags = None
            break
        tags.add(simple.tag)
    if len(_TAG_ONLY_CACHE) < 4096:
        _TAG_ONLY_CACHE[key] = tags
    return tags


def find_all(root: Node, selector) -> list:
    """goquery Find(): matching element descendants, document order, snapshot."""
    if isinstance(selector, str):
        chains = compile_selector(selector)
        tags = _tag_only_set(chains, selector)
    else:
        chains = selector
        tags = None
    if tags is not None:
        # fast path: plain tag-set selectors ("p,td", "div", "script,style,…")
        return [
            n for n in _iter_descendants(root)
            if n.type == ELEMENT_NODE and n.data in tags
        ]
    result = []
    for n in _iter_descendants(root):
        if n.type != ELEMENT_NODE:
            continue
        for ch in chains:
            if ch.matches(n):
                result.append(n)
                break
    return result


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
