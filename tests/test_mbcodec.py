"""Parity tests for engine/mbcodec.py — the Go-exact CJK decoders.

The ground truth is the reference's vendored x/text decoder tables
(vendor/golang.org/x/text/encoding/*/tables.go, parsed into
ukeeper_readability_spark/data/mbtables.py by tools/gen_multibyte_tables.py)
plus the decoder state machines in gbk.go / big5.go / shiftjis.go / eucjp.go
/ euckr.go / iso2022jp.go. Python's nearest stdlib codecs are used as an
INDEPENDENT differential baseline: the exact per-family divergence counts
are pinned, so a table-parse shift or a decoder-logic bug (which would move
thousands of cells) cannot hide inside the expected divergence.
"""

import random

import pytest

from ukeeper_readability_spark.engine.charset import (
    charset_new_reader,
    lookup,
)
from ukeeper_readability_spark.engine.mbcodec import decode_mb

FFFD = "�"


# ---------------------------------------------------------------------------
# well-formed round-trips where Python codecs agree (sanity vs shifts)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "family,codec,text",
    [
        ("gbk", "gbk", "你好，世界 — 简体中文测试"),
        ("gb18030", "gb18030", "你好 Ā \U00020000 㐀"),
        ("big5", "big5", "漢字測試，繁體中文"),
        ("shift_jis", "cp932", "日本語のテスト、カタカナ、ひらがな"),
        ("euc-jp", "euc_jp", "日本語のテスト"),
        ("euc-kr", "cp949", "한국어 시험 텍스트"),
        ("iso-2022-jp", "iso2022_jp", "日本語テストです"),
    ],
)
def test_wellformed_roundtrip(family, codec, text):
    data = ("<p>" + text + "</p>").encode(codec)
    assert decode_mb(data, family) == "<p>" + text + "</p>"


# ---------------------------------------------------------------------------
# pinned divergence cells: Go/WHATWG table differs from the Python codec
# ---------------------------------------------------------------------------

def test_gbk_whatwg_only_cells():
    # GB18030-2000 additions absent from Python's gbk codec
    assert decode_mb(b"\xa2\xe3", "gbk") == "€"  # euro
    assert decode_mb(b"\xa3\xa0", "gbk") == "　"  # ideographic space
    assert decode_mb(b"\xa9\x89", "gbk") == "〾"
    # Microsoft CP936 single-byte euro (gbk.go:58-61)
    assert decode_mb(b"\x80", "gbk") == "€"
    assert decode_mb(b"\x80", "gb18030") == "€"


def test_big5_whatwg_vs_hkscs2004():
    # cells in the WHATWG big5 index that big5hkscs (HKSCS-2004) lacks
    assert decode_mb(b"\x87\x7a", "big5") == "㡵"
    assert decode_mb(b"\x87\x7b", "big5") == "\U00021d53"
    # the four two-rune cells (big5.go:60-68)
    assert decode_mb(b"\x88\x62", "big5") == "Ê̄"
    assert decode_mb(b"\x88\x64", "big5") == "Ê̌"
    assert decode_mb(b"\x88\xa3", "big5") == "ê̄"
    assert decode_mb(b"\x88\xa5", "big5") == "ê̌"


def test_sjis_no_pua_rows():
    # cp932 maps leads 0xF0-0xF9 to U+E000.. PUA; the vendored jis0208
    # table leaves them undefined -> U+FFFD
    assert b"\xf0\x40".decode("cp932") == ""
    assert decode_mb(b"\xf0\x40", "shift_jis") == FFFD
    # 0x80 passes through as U+0080 (shiftjis.go:83-84)
    assert decode_mb(b"\x80", "shift_jis") == "\x80"
    # half-width katakana singles
    assert decode_mb(b"\xa1\xb1\xdf", "shift_jis") == "｡ｱﾟ"


def test_eucjp_windows_style_cells():
    # WHATWG index-jis0208 uses the Microsoft mappings: wave dash cell
    # 0xA1C1 is U+FF5E (python euc_jp: U+301C), minus 0xA1DD is U+FF0D
    assert decode_mb(b"\xa1\xc1", "euc-jp") == "～"
    assert decode_mb(b"\xa1\xdd", "euc-jp") == "－"
    assert decode_mb(b"\xa1\xf1", "euc-jp") == "￠"
    # NEC row 13 (circled numbers) absent from python euc_jp
    assert decode_mb(b"\xad\xa1", "euc-jp") == "①"
    # jis0212 plane via 0x8f lead
    assert decode_mb(b"\x8f\xa2\xaf", "euc-jp") == "˘"
    # half-width katakana via 0x8e lead
    assert decode_mb(b"\x8e\xb1", "euc-jp") == "ｱ"


# ---------------------------------------------------------------------------
# ill-formed sequences: Go size (bytes-consumed) semantics
# ---------------------------------------------------------------------------

def test_sjis_ascii_trail_reprocessed():
    # lead + ASCII trail: U+FFFD consumes ONE byte, ASCII re-emitted
    assert decode_mb(b"\x81\x20A", "shift_jis") == FFFD + " A"
    assert decode_mb(b"\x81\x7fA", "shift_jis") == FFFD + "\x7fA"
    # trail 0xfd-0xff consumes TWO bytes
    assert decode_mb(b"\x81\xfdA", "shift_jis") == FFFD + "A"
    # truncated lead at EOF
    assert decode_mb(b"A\x81", "shift_jis") == "A" + FFFD


def test_gbk_trail_semantics():
    # undefined trail (0x7f) consumes one byte, 0x7f reprocessed as ASCII
    assert decode_mb(b"\x81\x7fA", "gbk") == FFFD + "\x7fA"
    # defined-range trail on an out-of-table cell consumes two
    assert decode_mb(b"\xff", "gbk") == FFFD
    # gbk (not gb18030) treats digit trails as errors, size 1
    assert decode_mb(b"\x81\x30\x81\x30", "gbk") == FFFD + "0" + FFFD + "0"


def test_gb18030_four_byte_errors():
    # bad third byte: U+FFFD consumes ONE byte (gbk.go:90-99)
    assert decode_mb(b"\x81\x30\x30\x30", "gb18030") == FFFD + "000"
    # truncated 4-byte at EOF
    assert decode_mb(b"\x81\x30\x81", "gb18030") == FFFD + "0" + FFFD


def test_big5_trail_semantics():
    # c1 < 0x40: size 1 (reprocess); c1 in 0x7f-0xa0: size 2 (swallow)
    assert decode_mb(b"\xa4\x30A", "big5") == FFFD + "0A"
    assert decode_mb(b"\xa4\x80A", "big5") == FFFD + "A"
    assert decode_mb(b"\xa4", "big5") == FFFD


def test_euckr_error_sizes():
    # decError: size 1 when trail is ASCII, else 2 (euckr.go:73-76)
    assert decode_mb(b"\x81\x20A", "euc-kr") == FFFD + " A"
    assert decode_mb(b"\xc7\x81A", "euc-kr") == FFFD + "A"  # non-ascii trail
    assert decode_mb(b"\xff", "euc-kr") == FFFD


def test_eucjp_error_sizes():
    # 0x8e with c1 > 0xdf: size 2, except 0xff which is size 1 (eucjp.go:44-52)
    assert decode_mb(b"\x8e\xe0A", "euc-jp") == FFFD + "A"
    # 0x8e+0xff: size 1, then each lone 0xff is its own U+FFFD
    assert decode_mb(b"\x8e\xff\xff", "euc-jp") == FFFD * 3
    # 0x8f with bad c1: size 1; bad c2: size 2
    assert decode_mb(b"\x8f\x41A", "euc-jp") == FFFD + "AA"
    assert decode_mb(b"\x8f\xa1\x41A", "euc-jp") == FFFD + "AA"


def test_iso2022jp_state_machine():
    # ESC $ B enters jis0208; \n resets to ASCII (iso2022jp.go:106-110)
    assert decode_mb(b"\x1b$B\x46\x7c\nA", "iso-2022-jp") == "日\nA"
    # ESC ( I katakana state
    assert decode_mb(b"\x1b(I\x31\x1b(BA", "iso-2022-jp") == "ｱA"
    # invalid escape: U+FFFD consumes ONE byte (the ESC)
    assert decode_mb(b"\x1b(XA", "iso-2022-jp") == FFFD + "(XA"
    # high bytes are always U+FFFD
    assert decode_mb(b"\x80\xffA", "iso-2022-jp") == FFFD * 2 + "A"
    # ESC $ ( without D: U+FFFD, size 1
    assert decode_mb(b"\x1b$(EA", "iso-2022-jp") == FFFD + "$(EA"


# ---------------------------------------------------------------------------
# exhaustive differential vs Python codecs (errors='replace') with PINNED
# divergence counts. Two divergence classes are counted together:
#   * cell-value diffs (tools/gen_multibyte_tables.py report: gbk 82,
#     big5 203, shift_jis 1880, euc-jp 463, euc-kr 0), and
#   * error-consume diffs on UNDEFINED cells — Go emits ONE U+FFFD for the
#     whole pair when the trail byte is in a defined range (size=2), while
#     Python's replace handler consumes only the lead byte.
# A table-parse shift or decoder-logic bug would move these counts by
# thousands, so the exact totals are pinned.
# ---------------------------------------------------------------------------

def _pairs(leads, trails):
    for c0 in leads:
        for c1 in trails:
            yield bytes((c0, c1))


def _count_diffs(family, codec, seqs):
    diffs = 0
    for seq in seqs:
        go = decode_mb(seq, family)
        py = seq.decode(codec, errors="replace")
        if go != py:
            diffs += 1
    return diffs


def test_exhaustive_gbk_vs_python():
    seqs = _pairs(range(0x81, 0xFF),
                  list(range(0x40, 0x7F)) + list(range(0x80, 0xFF)))
    assert _count_diffs("gbk", "gbk", seqs) == 2149


def test_exhaustive_big5_vs_python():
    seqs = _pairs(range(0x81, 0xFF),
                  list(range(0x40, 0x7F)) + list(range(0xA1, 0xFF)))
    assert _count_diffs("big5", "big5hkscs", seqs) == 1391


def test_exhaustive_sjis_vs_python():
    seqs = _pairs(list(range(0x81, 0xA0)) + list(range(0xE0, 0xFD)),
                  list(range(0x40, 0x7F)) + list(range(0x80, 0xFD)))
    # cp932 PUA rows + NEC/IBM dupes (1880 cells) + error-consume diffs
    assert _count_diffs("shift_jis", "cp932", seqs) == 3556


def test_exhaustive_eucjp_vs_python():
    seqs = _pairs(range(0xA1, 0xFF), range(0xA1, 0xFF))
    assert _count_diffs("euc-jp", "euc_jp", seqs) == 1963


def test_exhaustive_euckr_vs_python():
    # cp949 == WHATWG euc-kr on every DEFINED cell (0 value diffs);
    # the 642 diffs are all error-consume semantics on undefined cells
    trails = (list(range(0x41, 0x5B)) + list(range(0x61, 0x7B))
              + list(range(0x81, 0xFF)))
    n = 0
    for c0 in range(0x81, 0xFF):
        use = trails if c0 < 0xC7 else list(range(0xA1, 0xFF))
        n += _count_diffs("euc-kr", "cp949", _pairs([c0], use))
    assert n == 642


# ---------------------------------------------------------------------------
# fuzz: random byte soup must decode deterministically and never raise
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "family", ["gbk", "gb18030", "big5", "shift_jis", "euc-jp", "euc-kr",
               "iso-2022-jp"]
)
def test_fuzz_never_raises(family):
    rng = random.Random(20260817)
    for _ in range(300):
        data = bytes(rng.randrange(256) for _ in range(rng.randrange(64)))
        a = decode_mb(data, family)
        b = decode_mb(data, family)
        assert a == b
        a.encode("utf-8")  # output is always valid UTF-8 (no surrogates)


# ---------------------------------------------------------------------------
# E2E through charset detection (prescan finds the meta label)
# ---------------------------------------------------------------------------

def test_to_utf8_e2e_sjis_and_gbk():
    spec, name = lookup("shift_jis")
    assert spec == ("go-mb", "shift_jis") and name == "shift_jis"
    body = ('<html><head><meta charset="shift_jis"></head>'
            "<body><p>日本語のテスト</p></body></html>").encode("cp932")
    assert "日本語のテスト" in charset_new_reader(body, "text/html")

    body = ('<meta charset="gbk"><p>简体中文测试</p>').encode("gbk")
    out = charset_new_reader(body, "text/html")
    assert "简体中文测试" in out
    # divergent cell through the full path: euro at 0xA2E3
    body = b'<meta charset="gbk"><p>\xa2\xe3</p>'
    assert "€" in charset_new_reader(body, "text/html")


def test_lookup_labels_route_to_gomb():
    for label, fam in [("csshiftjis", "shift_jis"), ("ms932", "shift_jis"),
                       ("x-euc-jp", "euc-jp"), ("cn-big5", "big5"),
                       ("csiso2022jp", "iso-2022-jp"), ("korean", "euc-kr"),
                       ("gb18030", "gb18030")]:
        spec, _ = lookup(label)
        assert spec == ("go-mb", fam), (label, spec)


def test_harness_payload_roundtrip():
    """The transcode-gate payload alphabets must round-trip through the
    HARNESS encode codec (cp932/gbk materialize the bytes) and the Go-table
    decoder — i.e. sit on cells where both tables agree."""
    from ukeeper_readability_spark.data.synth import (
        BIG5_TO, CYR_TO, EUCKR_TO, GBK_TO, SJIS_TO,
    )
    for alpha in (SJIS_TO, GBK_TO, CYR_TO, EUCKR_TO, BIG5_TO):
        assert len(alpha) == 26
    for prefix, alpha, codec, fam in [
        ("ドク 7 ", SJIS_TO, "cp932", "shift_jis"),
        ("文档 7 ", GBK_TO, "gbk", "gbk"),
        ("문서 7 ", EUCKR_TO, "cp949", "euc-kr"),
        ("檔案 7 ", BIG5_TO, "big5", "big5"),
        ("ドク 7 ", SJIS_TO, "iso2022_jp", "iso-2022-jp"),
    ]:
        payload = prefix + alpha + " !"
        assert decode_mb(payload.encode(codec), fam) == payload, fam


# ---------------------------------------------------------------------------
# VERDICT r4 item 7: encode-with-Python → decode-with-mbcodec fixpoint
# properties per family over the WHATWG-agreeing payload alphabets, so a
# future table regeneration that skews an agreeing cell breaks HERE (fast,
# no Spark) before it silently skews the transcode-gate corpus.
# ---------------------------------------------------------------------------

def _roundtrip_cases():
    from ukeeper_readability_spark.data.synth import (
        BIG5_TO, EUCKR_TO, GBK_TO, SJIS_TO,
    )
    ascii_safe = "abc XYZ 012 .,!?\"'<>/=~-_"
    return [
        ("gbk", "gbk", GBK_TO + ascii_safe),
        # gb18030 adds the 2-byte extension (Ā) and the 4-byte lattice
        # (㐀 BMP tail, U+20000 supplementary plane)
        ("gb18030", "gb18030", GBK_TO + "Ā㐀\U00020000" + ascii_safe),
        ("big5", "big5", BIG5_TO + ascii_safe),
        ("shift_jis", "cp932", SJIS_TO + ascii_safe),
        ("euc-jp", "euc_jp", SJIS_TO + "日本語" + ascii_safe),
        ("euc-kr", "cp949", EUCKR_TO + ascii_safe),
        ("iso-2022-jp", "iso2022_jp", SJIS_TO + "日本語" + ascii_safe),
    ]


@pytest.mark.parametrize(
    "family,codec,alphabet", _roundtrip_cases(),
    ids=[c[0] for c in _roundtrip_cases()],
)
def test_roundtrip_property_per_family(family, codec, alphabet):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.text(alphabet=list(alphabet), max_size=40))
    @settings(max_examples=200, deadline=None)
    def check(text):
        assert decode_mb(text.encode(codec), family) == text

    check()


def test_gb18030_four_byte_differential():
    """The 4-byte gb18030 path (range-table binary search + the linear
    supplementary-plane formula) agrees with Python's gb18030 codec on every
    WELL-FORMED sequence it defines — deterministic sample over the lattice
    plus the plane boundaries."""
    import itertools

    seqs = [
        bytes((c0, c1, c2, c3))
        for c0, c1, c2, c3 in itertools.product(
            range(0x81, 0xFF, 13), range(0x30, 0x3A, 3),
            range(0x81, 0xFF, 17), range(0x30, 0x3A, 4),
        )
    ]
    # boundaries: first/last BMP lattice points, first/last supplementary
    seqs += [b"\x81\x30\x81\x30", b"\x84\x39\xfe\x39",
             b"\x90\x30\x81\x30", b"\xe3\x32\x9a\x35"]
    diffs = 0
    for seq in seqs:
        go = decode_mb(seq, "gb18030")
        try:
            py = seq.decode("gb18030")
        except UnicodeDecodeError:
            continue  # undefined in python codec: covered by the 2-byte pins
        if go != py:
            diffs += 1
    assert diffs == 0
    assert decode_mb(b"\xe3\x32\x9a\x35", "gb18030") == "\U0010FFFF"
