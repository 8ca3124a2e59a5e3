"""Ports of the reference's text-op unit tables (extractor/text_test.go)."""

from ukeeper_readability_spark.engine.sanitize_text import (
    detect_type_charset,
    get_snippet,
    get_text,
    sanitize_html,
)
from ukeeper_readability_spark.htmldom import parse


def test_get_text_table():
    # extractor/text_test.go:13-25
    cases = [
        ("<p>hello world</p>", "", "hello world"),
        ("<p>My Title some text</p>", "My Title", "some text"),
        ("<p>hello    world</p>", "", "hello world"),
        ("<p>\thello\tworld</p>", "", "hello world"),
        ("<p>first sentence.Second sentence</p>", "", "first sentence. Second sentence"),
        ("", "", ""),
    ]
    for content, title, want in cases:
        assert get_text(content, title) == want, (content, title)


def test_get_snippet_table():
    # extractor/text_test.go:38-47 (SnippetSize 20)
    cases = [
        ("hello", "hello ..."),
        ("hello world this is a long text", "hello world this is ..."),
        ("hello\nworld this is longer text", "hello world this is ..."),
        ("", " ..."),
    ]
    for text, want in cases:
        assert get_snippet(text, 20) == want, text


def test_snippet_runes_not_bytes():
    # snippet size counts runes (extractor/text.go:45-46)
    s = "привет мир это длинный текст да"
    out = get_snippet(s, 12)
    assert out == "привет мир ..."
    assert get_snippet(s, 8) == "привет ..."


def test_to_utf8_report():
    # extractor/text_test.go:57-99 (report part; transcoding is a no-op on str)
    doc = parse("<html><body>hello</body></html>")
    assert detect_type_charset(doc) == ("text/html", "utf-8")
    assert detect_type_charset(doc, "text/html; charset=utf-8") == ("text/html", "utf-8")
    assert detect_type_charset(doc, "text/html; charset=windows-1251") == (
        "text/html",
        "windows-1251",
    )
    assert detect_type_charset(doc, "text/html; charset=unknown-xyz") == (
        "text/html",
        "unknown-xyz",
    )
    meta = parse(
        '<html><head><meta http-equiv="Content-Type" content="text/html; charset=windows-1251">'
        "</head><body>hello</body></html>"
    )
    assert detect_type_charset(meta) == ("text/html", "windows-1251")


def test_sanitize_html_entities():
    # kennygrant/sanitize semantics (vendor/.../sanitize/sanitize.go:102-160)
    assert sanitize_html("<p>a</p><p>b</p>") == "a\nb\n"
    assert sanitize_html("a<br>b") == "a\nb"
    assert sanitize_html("no tags here") == "no tags here"
    # tagless fast path skips newline handling entirely
    assert sanitize_html("keep\nnewline") == "keep\nnewline"
    assert sanitize_html("a&#8216;b&#8217;c") == "a'b'c"
    assert sanitize_html("x &amp; y") == "x & y"
    assert sanitize_html("<b>&quot;q&quot;</b>") == '"q"'


def test_tag_strip_regex_matches_literal_walk():
    """The regex tag-span removal must be char-for-char identical to
    sanitize.go:121-135's literal in_tag walk, including unterminated '<'
    (swallows to EOS) and stray '>' (dropped)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ukeeper_readability_spark.engine.sanitize_text import _RE_TAG_SPAN

    def literal_walk(s):
        buf, in_tag = [], False
        for ch in s:
            if ch == "<":
                in_tag = True
            elif ch == ">":
                in_tag = False
            elif not in_tag:
                buf.append(ch)
        return "".join(buf)

    def regex_walk(s):
        return _RE_TAG_SPAN.sub("", s).replace(">", "")

    @given(st.text(alphabet="<>ab \n&;", max_size=80))
    @settings(max_examples=500, deadline=None)
    def check(s):
        assert regex_walk(s) == literal_walk(s)

    check()
    for s in ("a>b<c>d", "<a<b>", "a<b", "<<>>", ">>a<<", "x<y>z<", "<"):
        assert regex_walk(s) == literal_walk(s), s
