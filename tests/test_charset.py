"""Byte-level toUtf8 parity (extractor/text.go:58-106 + vendored
x/net/html/charset). The headline case reproduces the reference's own
windows-1251 E2E test (extractor/readability_test.go:24-73): the vsiem fixture
served with `Content-Type: text/html; charset=windows-1251` must still produce
the 9665-byte golden, because the body's <meta charset=utf-8> wins the decode
(prescan) while the header label is only *reported*."""

import os

import pytest

from ukeeper_readability_spark.engine.charset import (
    determine_encoding,
    lookup,
    prescan,
    to_utf8,
)
from ukeeper_readability_spark.engine.extract import extract_document_bytes

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _fixture_bytes(name):
    with open(os.path.join(FIXTURES, name + ".html"), "rb") as fh:
        return fh.read()


def test_windows_1251_e2e_golden():
    """readability_test.go umputun_2015: header windows-1251, body meta utf-8."""
    body = _fixture_bytes("vsiem-mirom-dlia-obshchiei-polzy")
    r = extract_document_bytes(
        body,
        "http://u.com/2015/11/26/vsiem-mirom-dlia-obshchiei-polzy/",
        snippet_size=200,
        header_content_type="text/html; charset=windows-1251",
    )
    assert len(r["content"].encode()) == 9665
    assert r["title"] == "Всем миром для общей пользы • Umputun тут был"
    assert r["charset"] == "windows-1251"  # the REPORT keeps the header label
    assert r["type"] == "text/html"


def test_cp1251_bytes_with_own_meta_decode():
    html = (
        '<html><head><meta charset="windows-1251"><title>Тест</title></head>'
        "<body><div><p>привет мир это достаточно длинный текст для парсера "
        "и он продолжается дальше без знаков и остановок всё время просто "
        "слова слова слова идут подряд для общей длины текста этого абзаца "
        "чтобы пройти порог длины парсера без повтора и прочего шума тут"
        "</p></div></body></html>"
    )
    ct, enc, text = to_utf8(html.encode("cp1251"), "text/html; charset=windows-1251")
    assert (ct, enc) == ("text/html", "windows-1251")
    assert "привет мир" in text and "Тест" in text


def test_header_label_alone_never_decodes():
    """Load-bearing quirk: the declared label is passed as a contentType with
    no charset= param, so header-only cp1251 bytes decode as windows-1252."""
    body = "<html><body><p>привет</p></body></html>".encode("cp1251")
    ct, enc, text = to_utf8(body, "text/html; charset=windows-1251")
    assert enc == "windows-1251"  # reported...
    assert "привет" not in text  # ...but decoded as cp1252 mojibake
    assert body.decode("cp1252", errors="replace")[:40] in text


def test_no_declaration_utf8_default_skips_transcode():
    body = "<html><body><p>héllo wörld</p></body></html>".encode("utf-8")
    ct, enc, text = to_utf8(body)
    assert enc == "utf-8"
    assert "héllo wörld" in text


def test_meta_http_equiv_overrides_header_report():
    body = (
        b'<html><head><meta http-equiv="Content-Type" '
        b'content="text/html; charset=koi8-r"></head><body></body></html>'
    )
    ct, enc, _ = to_utf8(body, "text/html; charset=windows-1251")
    assert (ct, enc) == ("text/html", "koi8-r")


def test_determine_encoding_order():
    # BOM wins over everything
    assert determine_encoding(b"\xff\xfe<\x00", "text/html; charset=koi8-r")[1:] == (
        "utf-16le",
        True,
    )
    # charset param in the contentType position is honored (NewReaderLabel path)
    assert determine_encoding(b"<p>x</p>", "text/html; charset=koi8-r")[1:] == (
        "koi8-r",
        True,
    )
    # bare label (toUtf8's actual call shape) is ignored → prescan
    spec, name, certain = determine_encoding(
        b'<meta charset="koi8-r">', "windows-1251"
    )
    assert (name, certain) == ("koi8-r", False)
    # nothing at all, pure ASCII → windows-1252 fallback
    assert determine_encoding(b"<p>abc</p>", "")[1] == "windows-1252"
    # high-bit valid UTF-8 → Nop sniff
    spec, name, _ = determine_encoding("<p>héllo</p>".encode(), "")
    assert spec == ("nop",) and name == "utf-8"
    # high-bit invalid → windows-1252
    assert determine_encoding(b"<p>\xf0\x28\x8c\x28</p>", "")[1] == "windows-1252"


def test_prescan_rules():
    # charset attr needs no pragma
    assert prescan(b'<meta charset="cp866">')[1] == "ibm866"
    # content= needs the http-equiv pragma
    assert prescan(b'<meta content="text/html; charset=koi8-r">')[0] is None
    assert (
        prescan(
            b'<meta http-equiv="Content-Type" '
            b'content="text/html; charset=koi8-r">'
        )[1]
        == "koi8-r"
    )
    # utf-16 label is rewritten to utf-8 Nop
    spec, name = prescan(b'<meta charset="utf-16le">')
    assert spec == ("nop",) and name == "utf-8"
    # metas inside <script> raw text are invisible (Go tokenizer semantics)
    assert prescan(b'<script>"<meta charset=koi8-r>"</script>')[0] is None
    # a truncated tag at the 1024 boundary is ignored (no trailing '>')
    assert prescan(b'<meta charset="koi8-r"')[0] is None
    # unknown charset label keeps scanning later metas
    assert (
        prescan(b'<meta charset="bogus-enc"><meta charset="koi8-r">')[1] == "koi8-r"
    )


def test_label_aliases_follow_whatwg():
    assert lookup("latin1")[1] == "windows-1252"
    assert lookup("  UTF-8\t")[1] == "utf-8"
    assert lookup("iso-8859-9")[1] == "windows-1254"
    assert lookup("gb2312")[1] == "gbk"
    assert lookup("nope")[0] is None


def test_undefined_bytes_become_replacement_char():
    # cp1251 0x98 is unassigned: x/text maps it to U+FFFD, so do we
    body = b'<html><head><meta charset="windows-1251"></head><body>\x98</body></html>'
    _, _, text = to_utf8(body, "text/html; charset=windows-1251")
    assert "�" in text


def test_x_user_defined():
    body = b'<meta charset="x-user-defined">ab\x80\xff'
    _, _, text = to_utf8(body, "text/html; charset=x-user-defined")
    assert text.endswith("ab\uf780\uf7ff")  # 0x80+b -> U+F780+b


@pytest.mark.parametrize(
    "payload,enc_label,codec",
    [
        ("grüße aus köln und münchen", "iso-8859-15", "iso8859-15"),
        ("привет из москвы и киева", "koi8-r", "koi8-r"),
        ("καλημέρα από την αθήνα", "windows-1253", "cp1253"),
    ],
)
def test_roundtrip_various_charsets(payload, enc_label, codec):
    html = (
        f'<html><head><meta charset="{enc_label}"></head>'
        f"<body><p>{payload}</p></body></html>"
    )
    _, enc, text = to_utf8(html.encode(codec), f"text/html; charset={enc_label}")
    assert payload in text
    assert enc == enc_label


def test_charmap_overrides_match_reference_tables():
    """Cells where Python codecs diverge from the vendored x/text charmaps
    (vendor/golang.org/x/text/encoding/charmap/tables.go; diff enumerated by
    tools/gen_charmap_overrides.py)."""
    # ISO-8859-2..16: 0x80-0x9F unassigned in WHATWG -> U+FFFD, not C1 controls
    body = b'<meta charset="iso-8859-2">\x80\x9fA'
    _, _, text = to_utf8(body, "text/html; charset=iso-8859-2")
    assert text.endswith("��A")
    # koi8-u 0xAE/0xBE -> WHATWG ў/Ў cyrillic short-u, not box drawing
    body = b'<meta charset="koi8-u">\xae\xbe'
    _, _, text = to_utf8(body, "text/html; charset=koi8-u")
    assert text.endswith("ўЎ")
    # cp1255 0xCA -> U+05BA (unassigned in the Python codec)
    body = b'<meta charset="windows-1255">\xca'
    _, _, text = to_utf8(body, "text/html; charset=windows-1255")
    assert text.endswith("ֺ")


def test_nop_path_preserves_invalid_bytes():
    """encoding.Nop parity (x/net/html/charset charset.go:69-76): invalid
    UTF-8 under the Nop/declared-utf-8 paths round-trips byte-exactly via
    surrogateescape + gostr.utf8_bytes, and counts 1 byte per invalid byte
    like Go len()."""
    from ukeeper_readability_spark.htmldom.gostr import (
        to_valid_utf8,
        utf8_bytes,
        utf8_len,
    )

    # declared utf-8: transform skipped entirely (text.go:90)
    raw = b"<p>ok \xff\x80\xfe then</p>"
    _, enc, text = to_utf8(raw, "text/html; charset=utf-8")
    assert enc == "utf-8"
    assert utf8_bytes(text) == raw
    assert utf8_len(text) == len(raw)

    # Nop via sniff: first 1024 bytes valid UTF-8, corrupt bytes later
    raw2 = ("<p>" + "é" * 600 + "</p>").encode("utf-8") + b"<p>tail \x80\xff</p>"
    _, _, text2 = to_utf8(raw2)
    assert utf8_bytes(text2) == raw2

    # columnar boundary: surrogates scrub to per-byte U+FFFD
    assert to_valid_utf8(text) == "<p>ok ��� then</p>"


def test_extraction_pipeline_with_corrupt_bytes():
    """extract_document_bytes end-to-end on a corrupt-byte document: no crash,
    content survives, and the corrupt bytes inside extracted text stay
    byte-preserving at the engine level."""
    from ukeeper_readability_spark.engine.extract import extract_document_bytes
    from ukeeper_readability_spark.htmldom.gostr import utf8_bytes

    para = "Real article text. " * 30
    raw = (
        "<html><head><title>t</title></head><body><div><p>"
        + para + "corrupt:"
    ).encode("utf-8") + b"\x80\xfe" + ("</p><p>" + para + "</p></div></body></html>").encode("utf-8")
    res = extract_document_bytes(raw, "http://example.com/a", header_content_type="text/html; charset=utf-8")
    assert "Real article text." in res["content"]
    assert b"corrupt:\x80\xfe" in utf8_bytes(res["content"])
