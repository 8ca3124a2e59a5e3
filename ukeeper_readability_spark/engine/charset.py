"""Byte-level charset detection + transcoding to UTF-8 (toUtf8 port).

Reference: extractor/text.go:58-106 (toUtf8) and its vendored
golang.org/x/net/html/charset (NewReader/DetermineEncoding/prescan) +
golang.org/x/text/encoding/htmlindex label table. This is a semantic port, not
a copy — cited file:line throughout.

Load-bearing reference quirk (text.go:90-95): the DECLARED encoding (header
Content-Type, overridden by <meta http-equiv=Content-Type>) is what toUtf8
*reports*, but it is passed to charset.NewReader as a bare label in the
*contentType* position, where mime.ParseMediaType finds no `charset=` param.
The encoding actually used for the byte→UTF-8 decode therefore comes ONLY from
(in order): BOM sniff → HTML5 prescan of the first 1024 bytes → UTF-8 validity
sniff → windows-1252 fallback (charset.go:52-102). A body whose only charset
signal is the HTTP header is decoded as windows-1252, faithfully.

Decode error behavior: the vendored x/text charmap tables map bytes with no
assignment to U+FFFD (tables.go, e.g. windows-1251 0x98). Python's
errors='replace' mostly matches, but diverges at 387 cells (verified by
tools/gen_charmap_overrides.py diffing every vendored charmap against the
stdlib codec): the ISO-8859-2..16 C1 range 0x80-0x9F decodes to control chars
in Python but U+FFFD in x/text, koi8-u 0xAE/0xBE decode to box-drawing chars
instead of WHATWG's ў/Ў, and cp1255 0xCA is unassigned in Python but U+05BA
in WHATWG. Those codecs decode through _CODEC_OVERRIDES translate tables so
the output is cell-for-cell identical to the reference.

Go's encoding.Nop passes invalid UTF-8 bytes through raw (Go strings tolerate
them); Python strs can't, so the Nop path decodes utf-8 with
errors='surrogateescape' — identical output for valid input, and
byte-preserving for invalid input (re-encoding with surrogateescape restores
the original bytes exactly; see utf8_len/reencode in sanitize_text).
"""

from __future__ import annotations

from typing import Optional, Tuple

from ..htmldom.parser import (
    TOK_START,
    _tokenize,
    parse_head,
)
from ..htmldom.query import find_all
from .sanitize_text import (
    DEFAULT_CONTENT_TYPE,
    DEFAULT_ENCODING,
    _split_content_type,
)

# ---------------------------------------------------------------------------
# WHATWG label → (decode spec, canonical name); extracted from the reference's
# vendored htmlindex tables.go (228 labels / 40 encodings). Decode specs:
#   ("codec", python_codec)  — decode with errors='replace'
#   ("go-mb", family)        — CJK multi-byte via engine/mbcodec.py (table-
#                              driven port of the vendored x/text decoders)
#   ("nop",)                 — pass-through (utf-16-labeled prescan / utf-8 sniff)
#   ("userdef",)             — x-user-defined: 0x80+b → U+F780+b (WHATWG)
#   ("replacement",)         — whole stream → one U+FFFD (WHATWG replacement)
# ---------------------------------------------------------------------------

_ENC_CODEC = {
    "utf-8": "utf-8",
    "ibm866": "cp866",
    "iso-8859-2": "iso8859-2",
    "iso-8859-3": "iso8859-3",
    "iso-8859-4": "iso8859-4",
    "iso-8859-5": "iso8859-5",
    "iso-8859-6": "iso8859-6",
    "iso-8859-7": "iso8859-7",
    "iso-8859-8": "iso8859-8",
    "iso-8859-8-i": "iso8859-8",
    "iso-8859-10": "iso8859-10",
    "iso-8859-13": "iso8859-13",
    "iso-8859-14": "iso8859-14",
    "iso-8859-15": "iso8859-15",
    "iso-8859-16": "iso8859-16",
    "koi8-r": "koi8-r",
    "koi8-u": "koi8-u",
    "macintosh": "mac-roman",
    "windows-874": "cp874",
    "windows-1250": "cp1250",
    "windows-1251": "cp1251",
    "windows-1252": "cp1252",
    "windows-1253": "cp1253",
    "windows-1254": "cp1254",
    "windows-1255": "cp1255",
    "windows-1256": "cp1256",
    "windows-1257": "cp1257",
    "windows-1258": "cp1258",
    "x-mac-cyrillic": "mac-cyrillic",
    "utf-16be": "utf-16-be",
    "utf-16le": "utf-16-le",
}

# Multi-byte CJK families: decoded by engine/mbcodec.py table-driven ports of
# the vendored x/text decoders, NOT by Python codecs — the nearest stdlib
# codecs (gbk, big5hkscs, cp932, euc_jp, cp949) diverge from the vendored
# WHATWG index tables on 82/203/1880/463/0 cells respectively, plus on
# ill-formed-sequence handling (tools/gen_multibyte_tables.py report).
_GO_MB = frozenset(
    ("gbk", "gb18030", "big5", "euc-jp", "iso-2022-jp", "shift_jis", "euc-kr")
)

_LABELS = {}


def _add(canonical: str, *labels: str) -> None:
    for lab in labels:
        _LABELS[lab] = canonical


_add("utf-8", "unicode-1-1-utf-8", "unicode11utf8", "unicode20utf8", "utf-8",
     "utf8", "x-unicode20utf8")
_add("ibm866", "866", "cp866", "csibm866", "ibm866")
_add("iso-8859-2", "csisolatin2", "iso-8859-2", "iso-ir-101", "iso8859-2",
     "iso88592", "iso_8859-2", "iso_8859-2:1987", "l2", "latin2")
_add("iso-8859-3", "csisolatin3", "iso-8859-3", "iso-ir-109", "iso8859-3",
     "iso88593", "iso_8859-3", "iso_8859-3:1988", "l3", "latin3")
_add("iso-8859-4", "csisolatin4", "iso-8859-4", "iso-ir-110", "iso8859-4",
     "iso88594", "iso_8859-4", "iso_8859-4:1988", "l4", "latin4")
_add("iso-8859-5", "csisolatincyrillic", "cyrillic", "iso-8859-5", "iso-ir-144",
     "iso8859-5", "iso88595", "iso_8859-5", "iso_8859-5:1988")
_add("iso-8859-6", "arabic", "asmo-708", "csiso88596e", "csiso88596i",
     "csisolatinarabic", "ecma-114", "iso-8859-6", "iso-8859-6-e",
     "iso-8859-6-i", "iso-ir-127", "iso8859-6", "iso88596", "iso_8859-6",
     "iso_8859-6:1987")
_add("iso-8859-7", "csisolatingreek", "ecma-118", "elot_928", "greek", "greek8",
     "iso-8859-7", "iso-ir-126", "iso8859-7", "iso88597", "iso_8859-7",
     "iso_8859-7:1987", "sun_eu_greek")
_add("iso-8859-8", "csiso88598e", "csisolatinhebrew", "hebrew", "iso-8859-8",
     "iso-8859-8-e", "iso-ir-138", "iso8859-8", "iso88598", "iso_8859-8",
     "iso_8859-8:1988", "visual")
_add("iso-8859-8-i", "csiso88598i", "iso-8859-8-i", "logical")
_add("iso-8859-10", "csisolatin6", "iso-8859-10", "iso-ir-157", "iso8859-10",
     "iso885910", "l6", "latin6")
_add("iso-8859-13", "iso-8859-13", "iso8859-13", "iso885913")
_add("iso-8859-14", "iso-8859-14", "iso8859-14", "iso885914")
_add("iso-8859-15", "csisolatin9", "iso-8859-15", "iso8859-15", "iso885915",
     "iso_8859-15", "l9")
_add("iso-8859-16", "iso-8859-16")
_add("koi8-r", "cskoi8r", "koi", "koi8", "koi8-r", "koi8_r")
_add("koi8-u", "koi8-ru", "koi8-u")
_add("macintosh", "csmacintosh", "mac", "macintosh", "x-mac-roman")
_add("windows-874", "dos-874", "iso-8859-11", "iso8859-11", "iso885911",
     "tis-620", "windows-874")
_add("windows-1250", "cp1250", "windows-1250", "x-cp1250")
_add("windows-1251", "cp1251", "windows-1251", "x-cp1251")
_add("windows-1252", "ansi_x3.4-1968", "ascii", "cp1252", "cp819",
     "csisolatin1", "ibm819", "iso-8859-1", "iso-ir-100", "iso8859-1",
     "iso88591", "iso_8859-1", "iso_8859-1:1987", "l1", "latin1", "us-ascii",
     "windows-1252", "x-cp1252")
_add("windows-1253", "cp1253", "windows-1253", "x-cp1253")
_add("windows-1254", "cp1254", "csisolatin5", "iso-8859-9", "iso-ir-148",
     "iso8859-9", "iso88599", "iso_8859-9", "iso_8859-9:1989", "l5", "latin5",
     "windows-1254", "x-cp1254")
_add("windows-1255", "cp1255", "windows-1255", "x-cp1255")
_add("windows-1256", "cp1256", "windows-1256", "x-cp1256")
_add("windows-1257", "cp1257", "windows-1257", "x-cp1257")
_add("windows-1258", "cp1258", "windows-1258", "x-cp1258")
_add("x-mac-cyrillic", "x-mac-cyrillic", "x-mac-ukrainian")
_add("gbk", "chinese", "csgb2312", "csiso58gb231280", "gb2312", "gb_2312",
     "gb_2312-80", "gbk", "iso-ir-58", "x-gbk")
_add("gb18030", "gb18030")
_add("big5", "big5", "big5-hkscs", "cn-big5", "csbig5", "x-x-big5")
_add("euc-jp", "cseucpkdfmtjapanese", "euc-jp", "x-euc-jp")
_add("iso-2022-jp", "csiso2022jp", "iso-2022-jp")
_add("shift_jis", "csshiftjis", "ms932", "ms_kanji", "shift-jis", "shift_jis",
     "sjis", "windows-31j", "x-sjis")
_add("euc-kr", "cseuckr", "csksc56011987", "euc-kr", "iso-ir-149", "korean",
     "ks_c_5601-1987", "ks_c_5601-1989", "ksc5601", "ksc_5601", "windows-949")
_add("replacement", "csiso2022kr", "hz-gb-2312", "iso-2022-cn",
     "iso-2022-cn-ext", "iso-2022-kr", "replacement")
_add("utf-16be", "unicodefffe", "utf-16be")
_add("utf-16le", "csunicode", "iso-10646-ucs-2", "ucs-2", "unicode",
     "unicodefeff", "utf-16", "utf-16le")
_add("x-user-defined", "x-user-defined")

_NOP = ("nop",)
_ASCII_WS = " \t\n\f\r"

# ---------------------------------------------------------------------------
# Cells where the Python stdlib codec diverges from the reference's vendored
# x/text charmap decode tables (vendor/golang.org/x/text/encoding/charmap/
# tables.go — WHATWG encoding-standard indexes). Generated + verified by
# tools/gen_charmap_overrides.py, which diffs every vendored charmap against
# the stdlib codec cell-by-cell. Three families of divergence exist:
#   * ISO-8859-2..16: Python decodes 0x80-0x9F to C1 controls; WHATWG/x/text
#     leave them unassigned → U+FFFD.
#   * koi8-u: Python (RFC 2319) keeps box-drawing at 0xAE/0xBE; WHATWG maps
#     them to ў (U+045E) / Ў (U+040E).
#   * cp1255: Python leaves 0xCA unassigned; WHATWG maps it to U+05BA.
# ---------------------------------------------------------------------------

_C1_FFFD_CODECS = frozenset(
    "iso8859-%d" % n for n in (2, 3, 4, 5, 6, 7, 8, 10, 13, 14, 15, 16)
)
_CODEC_OVERRIDES = {
    "koi8-u": {0xAE: "ў", 0xBE: "Ў"},
    "cp1255": {0xCA: "ֺ"},
}
_DECODE_TABLES: dict = {}


def _decode_table(codec: str):
    """256-entry latin-1→target translate table for a divergent codec."""
    tbl = _DECODE_TABLES.get(codec)
    if tbl is None:
        over = dict(_CODEC_OVERRIDES.get(codec, ()))
        if codec in _C1_FFFD_CODECS:
            for b in range(0x80, 0xA0):
                over[b] = "�"
        tbl = str.maketrans({
            chr(i): over.get(i, bytes((i,)).decode(codec, errors="replace"))
            for i in range(256)
        })
        _DECODE_TABLES[codec] = tbl
    return tbl

# ASCII-only lowercasing (Go prescan lowers only A-Z in place; full .lower()
# would also fold non-ASCII, which Go does not — charset.go:170-174)
_ASCII_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)

_BOMS = (  # order matters: utf-16 BOMs checked before utf-8 (charset.go:243-251)
    (b"\xfe\xff", "utf-16be"),
    (b"\xff\xfe", "utf-16le"),
    (b"\xef\xbb\xbf", "utf-8"),
)


def lookup(label: str) -> Tuple[Optional[tuple], str]:
    """charset.Lookup (charset.go:31-38): label → (decode spec, canonical name).

    Matching is case-insensitive with ASCII-whitespace trim (htmlindex.Get).
    Returns (None, "") for unknown labels.
    """
    canonical = _LABELS.get(label.strip(_ASCII_WS).translate(_ASCII_LOWER))
    if canonical is None:
        return None, ""
    if canonical == "replacement":
        return ("replacement",), canonical
    if canonical == "x-user-defined":
        return ("userdef",), canonical
    if canonical in _GO_MB:
        return ("go-mb", canonical), canonical
    return ("codec", _ENC_CODEC[canonical]), canonical


def _media_type_charset(content_type: str) -> Optional[str]:
    """mime.ParseMediaType(contentType)'s charset param, or None.

    In toUtf8 the string in this position is the bare declared-encoding label
    (text.go:92), which never carries a `charset=` param — load-bearing: the
    declared label is thereby IGNORED for decoding. Malformed parameter lists
    make Go's ParseMediaType error → treated as no charset, same here.
    """
    if not content_type or not content_type.strip():
        return None
    parts = content_type.split(";")
    params = {}
    for p in parts[1:]:
        p = p.strip()
        if not p or "=" not in p:
            return None  # ParseMediaType error → DetermineEncoding skips
        k, v = p.split("=", 1)
        k = k.strip().lower()
        v = v.strip()
        if len(v) >= 2 and v[0] == '"' and v[-1] == '"':
            v = v[1:-1]
        if not k:
            return None
        params.setdefault(k, v)
    return params.get("charset")


def _from_meta_element(s: str) -> str:
    """fromMetaElement (charset.go:215-245): charset value out of a
    `content="text/html; charset=..."` attribute, HTML5 grammar."""
    while s:
        loc = s.find("charset")
        if loc == -1:
            return ""
        s = s[loc + len("charset"):]
        s = s.lstrip(_ASCII_WS)
        if not s.startswith("="):
            continue
        s = s[1:].lstrip(_ASCII_WS)
        if not s:
            return ""
        q = s[0]
        if q in ('"', "'"):
            s = s[1:]
            close = s.find(q)
            if close == -1:
                return ""
            return s[:close]
        end = len(s)
        for i, c in enumerate(s):
            if c in "; \t\n\f\r":
                end = i
                break
        return s[:end]
    return ""


def prescan(content: bytes) -> Tuple[Optional[tuple], str]:
    """HTML5 encoding prescan over ≤1024 bytes (charset.go:139-213).

    Tokenizes a byte-transparent latin-1 view of the preview, truncated at the
    last '>' — Go's tokenizer yields ErrorToken on a tag cut off by the 1024-
    byte boundary, so a truncated <meta> is ignored there too.
    """
    s = content.decode("latin-1")
    cut = s.rfind(">")
    s = s[: cut + 1] if cut != -1 else ""
    if not s:
        return None, ""
    for ttype, name, attrs, _sc in _tokenize(s):
        if ttype != TOK_START or name != "meta" or not attrs:
            continue
        got_pragma = False
        need = 0  # 0 dontKnow / 1 doNeedPragma / 2 doNotNeedPragma
        e: Optional[tuple] = None
        ename = ""
        for k, v in attrs:  # htmldom dedups repeated attrs first-wins, like Go
            v = (v or "").translate(_ASCII_LOWER)
            if k == "http-equiv":
                if v == "content-type":
                    got_pragma = True
            elif k == "content":
                if e is None:
                    nm = _from_meta_element(v)
                    if nm:
                        e, ename = lookup(nm)
                        if e is not None:
                            need = 1
            elif k == "charset":
                e, ename = lookup(v)  # overrides content=; may reset to None
                need = 2
        if need == 0 or (need == 1 and not got_pragma):
            continue
        if ename.startswith("utf-16"):
            # utf-16-labeled prescan result is treated as utf-8 pass-through
            # (the bytes being scanned are ASCII-compatible, so the label lies)
            ename = "utf-8"
            e = _NOP
        if e is not None:
            return e, ename
    return None, ""


def determine_encoding(content: bytes, content_type: str) -> Tuple[tuple, str, bool]:
    """charset.DetermineEncoding (charset.go:52-102): BOM → Content-Type
    charset param → prescan → UTF-8 sniff → windows-1252 fallback."""
    content = content[:1024]

    for bom, enc in _BOMS:
        if content.startswith(bom):
            e, name = lookup(enc)
            return e, name, True

    cs = _media_type_charset(content_type)
    if cs is not None:
        e, name = lookup(cs)
        if e is not None:
            return e, name, True

    if content:
        e, name = prescan(content)
        if e is not None:
            return e, name, False

    # UTF-8 sniff: drop a trailing partial rune, then any high bit + valid
    # UTF-8 → Nop (raw pass-through)
    c = content
    for i in range(len(c) - 1, max(-1, len(c) - 4), -1):
        b = c[i]
        if b < 0x80:
            break
        if b & 0xC0 != 0x80:  # utf8.RuneStart
            c = c[:i]
            break
    if any(x >= 0x80 for x in c):
        try:
            c.decode("utf-8")
            return _NOP, "utf-8", False
        except UnicodeDecodeError:
            pass

    return ("codec", "cp1252"), "windows-1252", False


def decode_bytes(content: bytes, spec: tuple) -> str:
    """Apply a decode spec with x/text error semantics (undefined → U+FFFD)."""
    kind = spec[0]
    if kind == "nop":
        # Go passes raw bytes through; Python strs can't hold invalid UTF-8,
        # so invalid bytes become surrogateescape chars — byte-preserving
        # (htmldom.gostr.utf8_bytes restores the exact input) and counted as
        # 1 byte by the Go-len helpers, matching encoding.Nop.
        return content.decode("utf-8", errors="surrogateescape")
    if kind == "userdef":
        return "".join(
            chr(b) if b < 0x80 else chr(0xF780 + b - 0x80) for b in content
        )
    if kind == "replacement":
        return "�" if content else ""
    if kind == "go-mb":
        from .mbcodec import decode_mb

        return decode_mb(content, spec[1])
    codec = spec[1]
    if codec in _C1_FFFD_CODECS or codec in _CODEC_OVERRIDES:
        return content.decode("latin-1").translate(_decode_table(codec))
    return content.decode(codec, errors="replace")


def charset_new_reader(content: bytes, content_type: str) -> str:
    """charset.NewReader (charset.go:106-124): decode per DetermineEncoding
    over the first 1024 bytes; Nop short-circuits the transform."""
    spec, _name, _certain = determine_encoding(content[:1024], content_type)
    return decode_bytes(content, spec)


def to_utf8(
    content: bytes, header_content_type: Optional[str] = None
) -> Tuple[str, str, str]:
    """toUtf8 (extractor/text.go:58-106): returns (content_type, declared
    encoding, UTF-8 text).

    The report: header Content-Type (both fields overwritten if present, even
    to ""), then any <head><meta http-equiv=Content-Type> overrides both.
    The decode: only runs when the declared encoding != "utf-8" (exact,
    case-sensitive — a header saying "UTF-8" triggers the decode path, which
    then usually lands on prescan/sniff), and uses charset.NewReader semantics,
    NOT the declared label (module docstring).
    """
    content_type = DEFAULT_CONTENT_TYPE
    encoding = DEFAULT_ENCODING
    if header_content_type:
        content_type, encoding = _split_content_type(header_content_type)

    # meta scan on the raw (undecoded) body, byte-transparent latin-1 view —
    # the reference scans the pre-transcode string (text.go:78-88)
    doc = parse_head(content.decode("latin-1"))
    for meta in find_all(doc, "head meta"):
        if meta.attr_or("http-equiv", "").lower() == "content-type":
            content_type, encoding = _split_content_type(meta.attr_or("content", ""))

    if encoding != "utf-8":
        result = charset_new_reader(content, encoding)
    else:
        # declared utf-8 skips the transform entirely in Go (text.go:90) —
        # the body passes through raw, so byte-preserve here too
        result = content.decode("utf-8", errors="surrogateescape")
    return content_type, encoding, result
