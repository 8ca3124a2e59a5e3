"""Differential/property fuzz for htmldom/parser.py (VERDICT r3 item 7).

Completes the hypothesis-fuzz triangle: sanitize (test_text.py) and the
selector compiler (test_selector_cascadia.py) were fuzzed in round 3; this
module covers the HTML5 parser itself. Properties (all hold for the
reference's x/net/html parser, whose pointer semantics htmldom mirrors):

  1. any tag soup parses without exception;
  2. parsing is deterministic (same input → identical render);
  3. re-parse is a FIXPOINT after one round: render(parse(render(parse(s))))
     == render(parse(s)) — the serializer output is itself parseable and
     stable (x/net/html's "render-parse identity on well-formed trees");
  4. the full extract_document pipeline never raises and is deterministic,
     including on byte-soup carried as surrogateescape chars (gostr).
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from ukeeper_readability_spark.engine import extract_document
from ukeeper_readability_spark.htmldom import outer_html, parse

# alphabet concentrates on HTML structure chars, entity starts, nesting,
# rawtext/foreign-content triggers, plus non-ASCII and a surrogateescape
# byte (invalid-UTF-8 stand-in from the binary path)
_ALPHABET = list(
    "<>/='\"& ;!-abPIVt0\n"
) + ["<p", "<div", "</div", "<table", "<td", "<a href=", "<b", "<i",
     "<script", "</script>", "<style", "<svg", "<math", "<!--", "-->",
     "<![CDATA[", "<title", "<textarea", "&amp;", "&#", "й", "\udc80",
     "<br>", "<img src=x>", "<template", "<select", "<option", "<li",
     "<form", "<frameset", "<head", "<body", "<html", "<!doctype html>"]

_soup = st.lists(st.sampled_from(_ALPHABET), max_size=40).map("".join)


@given(_soup)
@settings(max_examples=1200, deadline=None)
def test_parse_never_raises_and_is_deterministic(s):
    d1 = parse(s)
    d2 = parse(s)
    r1, r2 = outer_html(d1), outer_html(d2)
    assert r1 == r2


@given(_soup)
@settings(max_examples=600, deadline=None)
def test_render_parse_fixpoint(s):
    r1 = outer_html(parse(s))
    r2 = outer_html(parse(r1))
    r3 = outer_html(parse(r2))
    # one normalization round may fold the soup; after that it's stable
    assert r3 == r2


@given(_soup)
@settings(max_examples=300, deadline=None)
def test_extract_document_never_raises_and_deterministic(s):
    url = "http://fuzz.example.com/a/b?q=1"
    a = extract_document(s, url, snippet_size=100)
    b = extract_document(s, url, snippet_size=100)
    assert a == b
    # contract: the result dict always carries the full column set as strings
    for key in ("title", "content", "rich_content", "excerpt"):
        assert isinstance(a[key], str)
