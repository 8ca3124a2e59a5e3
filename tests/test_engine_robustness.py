"""Property-based robustness: the engine must never crash and must be
deterministic on arbitrary input — at 10^12 turns every weird byte sequence
WILL occur. (The reference gets this for free from Go's x/net/html; our
hand-rolled parser needs the fuzz.)"""

from hypothesis import given, settings
from hypothesis import strategies as st

from ukeeper_readability_spark.engine import extract_document
from ukeeper_readability_spark.htmldom import outer_html, parse

TAGS = ["div", "p", "a", "ul", "li", "table", "tr", "td", "br", "img", "script", "b", "title"]

html_soup = st.recursive(
    st.text(max_size=40),
    lambda children: st.builds(
        lambda tag, body, close: f"<{tag}>{body}" + (f"</{tag}>" if close else ""),
        st.sampled_from(TAGS),
        children,
        st.booleans(),
    ),
    max_leaves=8,
)


@settings(max_examples=150, deadline=None)
@given(html_soup)
def test_parse_never_crashes_and_is_deterministic(s):
    d1 = outer_html(parse(s))
    d2 = outer_html(parse(s))
    assert d1 == d2
    assert d1.startswith("<html>")


@settings(max_examples=60, deadline=None)
@given(html_soup, st.sampled_from(["", "http://e.com/a", "not a url", "//x", "ftp://h/p"]))
def test_extract_never_crashes(s, url):
    r1 = extract_document(s, url, snippet_size=50)
    r2 = extract_document(s, url, snippet_size=50)
    assert r1 == r2
    assert isinstance(r1["content"], str)
    assert r1["excerpt"].endswith(" ...")


@settings(max_examples=80, deadline=None)
@given(st.text(alphabet="<>&\"'=/ abpil\n\t", max_size=80))
def test_tag_soup_garbage(s):
    parse(s)
    extract_document(s, "http://e.com/")


@settings(max_examples=50, deadline=None)
@given(html_soup)
def test_reparse_of_render_is_stable(s):
    """render(parse(x)) must be a fixed point after one round trip — the
    sanitize stage re-parses its own serialization, so this property is
    load-bearing for idempotent extraction."""
    once = outer_html(parse(s))
    twice = outer_html(parse(once))
    assert parse_stable(once, twice)


def parse_stable(once, twice):
    return once == twice
