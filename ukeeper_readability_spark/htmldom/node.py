"""A minimal HTML DOM with the same pointer semantics as Go's golang.org/x/net/html.

The readability algorithm we re-express (reference:
vendor/github.com/mauidude/go-readability/readability.go) mutates the DOM while
iterating pre-computed node snapshots, and some of its observable output depends on
exactly how node detachment behaves (e.g. replace-with-whitespace keeps stale parent
pointers on already-snapshotted descendants, readability.go:435-448). To keep per-turn
byte parity we mirror x/net/html's Node structure: parent / first_child / last_child /
prev_sibling / next_sibling pointers and the AppendChild / RemoveChild / InsertBefore
operations with identical semantics.
"""

from __future__ import annotations

from typing import Optional

# node types (mirrors x/net/html NodeType)
ERROR_NODE = 0
TEXT_NODE = 1
DOCUMENT_NODE = 2
ELEMENT_NODE = 3
COMMENT_NODE = 4
DOCTYPE_NODE = 5


class Node:
    __slots__ = (
        "type",
        "data",          # tag name for elements, text for text nodes
        "attrs",         # list[(key, value)] — order preserved, keys lowercased
        "parent",
        "first_child",
        "last_child",
        "prev_sibling",
        "next_sibling",
    )

    def __init__(self, type_: int, data: str = "", attrs: Optional[list] = None):
        self.type = type_
        self.data = data
        self.attrs = attrs if attrs is not None else []
        self.parent: Optional[Node] = None
        self.first_child: Optional[Node] = None
        self.last_child: Optional[Node] = None
        self.prev_sibling: Optional[Node] = None
        self.next_sibling: Optional[Node] = None

    # --- attribute helpers -------------------------------------------------
    def get_attr(self, key: str) -> Optional[str]:
        for k, v in self.attrs:
            if k == key:
                return v
        return None

    def attr_or(self, key: str, default: str) -> str:
        v = self.get_attr(key)
        return default if v is None else v

    # --- tree mutation (x/net/html node.go semantics) ----------------------
    def append_child(self, c: "Node") -> None:
        """x/net/html Node.AppendChild: c must be detached."""
        assert c.parent is None and c.prev_sibling is None and c.next_sibling is None
        last = self.last_child
        if last is not None:
            last.next_sibling = c
        else:
            self.first_child = c
        self.last_child = c
        c.parent = self
        c.prev_sibling = last

    def remove_child(self, c: "Node") -> None:
        """x/net/html Node.RemoveChild: c must be a child of self."""
        assert c.parent is self
        if self.first_child is c:
            self.first_child = c.next_sibling
        if c.next_sibling is not None:
            c.next_sibling.prev_sibling = c.prev_sibling
        if self.last_child is c:
            self.last_child = c.prev_sibling
        if c.prev_sibling is not None:
            c.prev_sibling.next_sibling = c.next_sibling
        c.parent = None
        c.prev_sibling = None
        c.next_sibling = None

    def insert_before(self, new_child: "Node", old_child: Optional["Node"]) -> None:
        """x/net/html Node.InsertBefore: new_child must be detached.

        Deliberately does NOT verify that old_child is reachable from self —
        neither does the Go original, and the readability sanitize walk relies on
        that when re-parenting children of nodes that were converted to text nodes
        (go-readability readability.go:545-557 + 435-448).
        """
        assert new_child.parent is None and new_child.prev_sibling is None and new_child.next_sibling is None
        if old_child is not None:
            prev, nxt = old_child.prev_sibling, old_child
        else:
            prev, nxt = self.last_child, None
        if prev is not None:
            prev.next_sibling = new_child
        else:
            self.first_child = new_child
        if nxt is not None:
            nxt.prev_sibling = new_child
        else:
            self.last_child = new_child
        new_child.parent = self
        new_child.prev_sibling = prev
        new_child.next_sibling = nxt

    # --- traversal helpers --------------------------------------------------
    def children(self):
        c = self.first_child
        while c is not None:
            nxt = c.next_sibling
            yield c
            c = nxt

    def __repr__(self):  # pragma: no cover - debug aid
        if self.type == ELEMENT_NODE:
            return f"<Element {self.data} attrs={self.attrs!r}>"
        if self.type == TEXT_NODE:
            return f"<Text {self.data[:40]!r}>"
        return f"<Node type={self.type} data={self.data[:40]!r}>"
