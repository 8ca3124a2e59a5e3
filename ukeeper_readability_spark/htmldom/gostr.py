"""Go-string byte semantics for Python strs.

Go strings are arbitrary byte sequences; `len(s)` counts raw bytes and invalid
UTF-8 passes through encoding.Nop untouched (reference
vendor/golang.org/x/net/html/charset/charset.go:69-76). Python strs can't hold
raw invalid bytes, so the charset Nop path decodes with
errors='surrogateescape' (invalid byte b → U+DC80+b-0x80, one char per byte).

The `go-bytes` encode error handler makes that representation round-trip AND
count like Go:

- U+DC80..U+DCFF (surrogateescape chars) encode back to their ORIGINAL single
  byte — so ``utf8_len`` counts an invalid input byte as 1, exactly Go's
  ``len``, and ``utf8_bytes`` reproduces the input bytes exactly.
- any other lone surrogate (defensive; none are produced by the pipeline —
  html.unescape maps surrogate charrefs to U+FFFD) encodes as its 3-byte
  CESU-8 form, matching the old errors='surrogatepass' behavior.
"""

import codecs


def _go_bytes_handler(exc):
    if isinstance(exc, UnicodeEncodeError):
        out = bytearray()
        for ch in exc.object[exc.start:exc.end]:
            c = ord(ch)
            if 0xDC80 <= c <= 0xDCFF:
                out.append(c - 0xDC00)
            else:
                out += bytes(
                    (0xE0 | (c >> 12), 0x80 | ((c >> 6) & 0x3F), 0x80 | (c & 0x3F))
                )
        return bytes(out), exc.end
    raise exc


codecs.register_error("go-bytes", _go_bytes_handler)


def utf8_bytes(s: str) -> bytes:
    """Encode with Go raw-byte semantics (surrogateescape chars → original byte)."""
    return s.encode("utf-8", "go-bytes")


def utf8_len(s: str) -> int:
    """Go ``len(string)``: UTF-8 byte count, invalid input bytes count as 1."""
    return len(s.encode("utf-8", "go-bytes"))


def to_valid_utf8(s: str):
    """Arrow/parquet boundary: replace any byte-escape surrogates with U+FFFD.

    Valid strings pass through untouched (fast path). The replacement is
    per-invalid-byte, identical to what a plain errors='replace' decode of the
    original bytes would have produced.
    """
    if s is None:
        return s
    try:
        s.encode("utf-8")
        return s
    except UnicodeEncodeError:
        return s.encode("utf-8", "go-bytes").decode("utf-8", "replace")
