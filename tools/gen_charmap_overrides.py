"""Generate single-byte decode overrides where Python codecs diverge from the
reference's vendored x/text charmap tables.

The reference decodes legacy single-byte encodings via
vendor/golang.org/x/text/encoding/charmap/tables.go — explicit 256-entry
decode tables (WHATWG encoding-standard indexes, public spec data). Python's
stdlib codecs mostly agree but diverge at a handful of cells (e.g. the
ISO-8859 C1 range 0x80-0x9F decodes to control chars in Python but U+FFFD in
x/text; koi8-u 0xAE/0xBE; cp1255 0xCA). This script parses the vendored
tables, diffs them against the Python codec used by engine/charset.py, and
prints the override dict pasted into engine/charset.py as _CODEC_OVERRIDES.

Run: python tools/gen_charmap_overrides.py
"""

import re
import sys

TABLES = "/root/reference/vendor/golang.org/x/text/encoding/charmap/tables.go"

# x/text charmap var name -> python codec used in engine/charset.py _ENC_CODEC
CHARMAPS = {
    "CodePage866": "cp866",
    "ISO8859_2": "iso8859-2",
    "ISO8859_3": "iso8859-3",
    "ISO8859_4": "iso8859-4",
    "ISO8859_5": "iso8859-5",
    "ISO8859_6": "iso8859-6",
    "ISO8859_7": "iso8859-7",
    "ISO8859_8": "iso8859-8",
    "ISO8859_10": "iso8859-10",
    "ISO8859_13": "iso8859-13",
    "ISO8859_14": "iso8859-14",
    "ISO8859_15": "iso8859-15",
    "ISO8859_16": "iso8859-16",
    "KOI8R": "koi8-r",
    "KOI8U": "koi8-u",
    "Macintosh": "mac-roman",
    "MacintoshCyrillic": "mac-cyrillic",
    "Windows874": "cp874",
    "Windows1250": "cp1250",
    "Windows1251": "cp1251",
    "Windows1252": "cp1252",
    "Windows1253": "cp1253",
    "Windows1254": "cp1254",
    "Windows1255": "cp1255",
    "Windows1256": "cp1256",
    "Windows1257": "cp1257",
    "Windows1258": "cp1258",
}

ENTRY = re.compile(r"\{(\d), \[3\]byte\{0x([0-9a-f]{2}), 0x([0-9a-f]{2}), 0x([0-9a-f]{2})\}\}")


def parse_tables(src: str):
    out = {}
    for var, codec in CHARMAPS.items():
        m = re.search(r"var %s \*Charmap = &(\w+)" % var, src)
        lower = m.group(1)
        body = src[src.index("var %s = Charmap{" % lower):]
        body = body[body.index("decode: [256]utf8Enc{"):]
        entries = []
        for em in ENTRY.finditer(body):
            n = int(em.group(1))
            bs = bytes(int(em.group(g), 16) for g in (2, 3, 4))[:n]
            entries.append(bs.decode("utf-8"))
            if len(entries) == 256:
                break
        assert len(entries) == 256, (var, len(entries))
        out[codec] = entries
    return out


def main():
    src = open(TABLES).read()
    ref = parse_tables(src)
    print("_CODEC_OVERRIDES = {")
    total = 0
    for codec, table in sorted(ref.items()):
        diffs = {}
        for b in range(256):
            py = bytes([b]).decode(codec, errors="replace")
            if py != table[b]:
                diffs[b] = table[b]
        if diffs:
            total += len(diffs)
            items = ", ".join(
                "0x%02x: %s" % (b, ascii(ch)) for b, ch in sorted(diffs.items())
            )
            print('    "%s": {%s},' % (codec, items))
    print("}")
    print("# total overridden cells: %d" % total, file=sys.stderr)


if __name__ == "__main__":
    main()
