"""normalizeLinks — absolutize href/src/action/background and collect links.

Port of UReadability.normalizeLinks (reference extractor/readability.go:211-237):
regex over the rich-HTML string (double-quoted attributes only, reLinks at
readability.go:88), resolve each captured link against the final URL, and if the
resolved form differs, globally string-replace the quoted original with the quoted
absolute form (including the reference's quirk that an empty link `""` resolves to
the base URL and the global replace then hits every empty attribute).

Resolution is RFC 3986 (urljoin == Go's URL.ResolveReference); serialization
mimics Go URL.String(): path re-escaped only where needed (valid %XX runs kept),
query and fragment left verbatim.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit

from ..htmldom.gostr import utf8_bytes

RE_LINKS = re.compile(r'(href|src|action|background)="([^"]*)"')

_HEX = "0123456789ABCDEFabcdef"
# Go url.shouldEscape(encodePath): unreserved + sub-delims + ':' '@' '/'
_PATH_SAFE = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
    "-._~!$&'()*+,;=:@/"
)


def _escape_path(path: str) -> str:
    out = []
    i, n = 0, len(path)
    while i < n:
        c = path[i]
        if c == "%" and i + 2 < n and path[i + 1] in _HEX and path[i + 2] in _HEX:
            out.append(path[i : i + 3])
            i += 3
            continue
        if c in _PATH_SAFE:
            out.append(c)
        else:
            out.extend(f"%{b:02X}" for b in utf8_bytes(c))
        i += 1
    return "".join(out)


def _go_url_string(u: str) -> str:
    """Re-serialize like Go URL.String(): escape the path when needed."""
    try:
        parts = urlsplit(u)
    except ValueError:
        return u
    path = _escape_path(parts.path)
    out = []
    if parts.scheme:
        out.append(parts.scheme)
        out.append(":")
    if parts.netloc or (parts.scheme and u.startswith(parts.scheme + "://")):
        out.append("//")
        out.append(parts.netloc)
    out.append(path)
    if parts.query:
        out.append("?")
        out.append(parts.query)
    if parts.fragment:
        out.append("#")
        out.append(parts.fragment)
    return "".join(out)


_GO_QUOTE_ESCAPES = {
    "\\": "\\\\",
    '"': '\\"',
    "\n": "\\n",
    "\t": "\\t",
    "\r": "\\r",
    "\v": "\\v",
    "\f": "\\f",
    "\a": "\\a",
    "\b": "\\b",
}


def go_quote(s: str) -> str:
    """strconv.Quote subset (fmt %q): enough for URL-ish strings."""
    out = ['"']
    for ch in s:
        if ch in _GO_QUOTE_ESCAPES:
            out.append(_GO_QUOTE_ESCAPES[ch])
        elif ch.isprintable() or ch == " ":
            out.append(ch)
        else:
            cp = ord(ch)
            if cp < 0x80:
                out.append(f"\\x{cp:02x}")
            elif cp <= 0xFFFF:
                out.append(f"\\u{cp:04x}")
            else:
                out.append(f"\\U{cp:08x}")
    out.append('"')
    return "".join(out)


def resolve_link(base_url: str, link: str):
    """absoluteLink (readability.go:212-217): (resolved, changed) or (None, False)."""
    try:
        resolved = _go_url_string(urljoin(base_url, link))
        return resolved, resolved != link
    except ValueError:
        return None, False


def normalize_links(data: str, base_url: str):
    """Returns (rewritten_html, links) — links in match order."""
    result = data
    links = []
    for m in RE_LINKS.finditer(data):
        src_link = m.group(2)
        dst_link = src_link
        abs_link, changed = resolve_link(base_url, src_link)
        if changed:
            dst_link = abs_link
            result = result.replace(go_quote(src_link), go_quote(abs_link))
        links.append(dst_link)
    return result, links
