"""Cascadia-parity tests for htmldom/selector.py.

Table mirrors the semantics of the reference's vendored CSS engine
(vendor/github.com/andybalholm/cascadia: parser.go, selector.go,
pseudo_classes.go). Each case: (selector, html, expected list of matched
element ids) — every matchable element carries a unique id so expectations
are unambiguous and order (document pre-order) is asserted too.
"""

import pytest

from ukeeper_readability_spark.htmldom import find_all, parse
from ukeeper_readability_spark.htmldom.selector import SelectorError, parse_group


def ids(html, sel):
    doc = parse(html)
    out = []
    for n in find_all(doc, sel):
        out.append(n.get_attr("id") or ("<" + n.data + ">"))
    return out


CASES = [
    # --- attribute selectors (parser.go:352-438, selector.go:272-296) ---
    ("[title]", '<p id=a title=x></p><p id=b></p>', ["a"]),
    ("p[title=hello]", '<p id=a title=hello></p><p id=b title=hell></p>', ["a"]),
    ('p[title="hello world"]', '<p id=a title="hello world"></p>', ["a"]),
    ("p[title='hi']", "<p id=a title='hi'></p><p id=b title=Hi></p>", ["a"]),
    ('p[title="hi" i]', "<p id=a title=hi></p><p id=b title=HI></p>", ["a", "b"]),
    ("[class~=two]", '<p id=a class="one two three"></p><p id=b class="onetwo"></p>', ["a"]),
    ("[lang|=en]", '<p id=a lang=en></p><p id=b lang=en-US></p><p id=c lang=eng></p>', ["a", "b"]),
    ("[href^=http]", '<a id=a href=http://x></a><a id=b href=/rel></a>', ["a"]),
    ("[href$=\".png\"]", '<a id=a href=img.png></a><a id=b href=img.jpg></a>', ["a"]),
    ("[href*=example]", '<a id=a href=http://example.com></a><a id=b href=http://x.com></a>', ["a"]),
    ("a[href!=x]", '<a id=a href=x></a><a id=b href=y></a><a id=c></a>', ["b", "c"]),
    # whitespace-only ATTR VALUE never matches ^=/$=/*= (selector.go:373,388,403)
    # — but an empty selector value prefix-matches any non-blank attr
    ("[title^=\"\"]", '<p id=a title="  "></p><p id=b title=x></p>', ["b"]),
    ("[title*=x]", '<p id=a title=" "></p><p id=b title="axb"></p>', ["b"]),
    # cascadia regex extension
    ("[id#=^a\\d+$]", '<p id=a1></p><p id=a22></p><p id=b3></p>', ["a1", "a22"]),
    # whitespace inside brackets
    ("[ title = hello ]", '<p id=a title=hello></p>', ["a"]),
    # attribute selector targeting the articleBody idiom from real rule tables
    ("div[itemprop=articleBody] p", '<div itemprop=articleBody><p id=a>x</p></div><div><p id=b>y</p></div>', ["a"]),
    # --- compound + combinators (parser.go:754-867, selector.go:490-555) ---
    ("div > p", "<div><p id=a></p><span><p id=b></p></span></div>", ["a"]),
    ("div p", "<div><p id=a></p><span><p id=b></p></span></div>", ["a", "b"]),
    ("h1 + p", "<h1></h1><p id=a></p><p id=b></p>", ["a"]),
    # text/comment nodes between adjacent siblings are skipped (selector.go:537-544)
    ("h1 + p", "<h1></h1> text <!-- c --> <p id=a></p>", ["a"]),
    ("h1 ~ p", "<p id=z></p><h1></h1><p id=a></p><div></div><p id=b></p>", ["a", "b"]),
    ("h1 + p", "<h1></h1><div></div><p id=a></p>", []),
    # --- pseudo-classes: structural (pseudo_classes.go:157-304) ---
    (":first-child", "<body><p id=a></p><p id=b></p></body>", ["<html>", "<head>", "a"]),
    ("p:first-child", "<div>text<p id=a></p><p id=b></p></div>", ["a"]),
    ("p:last-child", "<div><p id=a></p><p id=b></p>tail</div>", ["b"]),
    ("p:nth-child(2)", "<div><p id=a></p><p id=b></p><p id=c></p></div>", ["b"]),
    ("p:nth-child(odd)", "<div><p id=a></p><p id=b></p><p id=c></p></div>", ["a", "c"]),
    ("p:nth-child(even)", "<div><p id=a></p><p id=b></p><p id=c></p></div>", ["b"]),
    ("p:nth-child(2n+1)", "<div><p id=a></p><p id=b></p><p id=c></p></div>", ["a", "c"]),
    ("p:nth-child(-n+2)", "<div><p id=a></p><p id=b></p><p id=c></p></div>", ["a", "b"]),
    ("p:nth-child( 2n + 1 )", "<div><p id=a></p><p id=b></p><p id=c></p></div>", ["a", "c"]),
    ("p:nth-last-child(1)", "<div><p id=a></p><p id=b></p></div>", ["b"]),
    ("p:nth-last-child(2n)", "<div><p id=a></p><p id=b></p><p id=c></p></div>", ["b"]),
    # of-type counts only same-tag siblings
    ("p:nth-of-type(2)", "<div><span></span><p id=a></p><span></span><p id=b></p></div>", ["b"]),
    ("p:first-of-type", "<div><span></span><p id=a></p><p id=b></p></div>", ["a"]),
    ("p:last-of-type", "<div><p id=a></p><p id=b></p><span></span></div>", ["b"]),
    ("p:only-child", "<div><p id=a></p></div><div><p id=b></p><p id=c></p></div>", ["a"]),
    ("p:only-of-type", "<div><span></span><p id=a></p></div>", ["a"]),
    # --- pseudo-classes: relative / text (pseudo_classes.go:26-124) ---
    ("p:not(.x)", '<p id=a class=x></p><p id=b></p>', ["b"]),
    ("div:has(span)", "<div id=a><p><span></span></p></div><div id=b><p></p></div>", ["a"]),
    ("div:haschild(span)", "<div id=a><p><span></span></p></div><div id=b><span></span></div>", ["b"]),
    ("p:contains(hello)", "<p id=a>say HeLLo now</p><p id=b>bye</p>", ["a"]),
    ("p:contains('hello world')", "<p id=a>hello world</p><p id=b>helloworld</p>", ["a"]),
    ("div:containsown(own)", "<div id=a>own text<p>deep</p></div><div id=b><p>own</p></div>", ["a"]),
    ("p:matches([0-9]+)", "<p id=a>abc 123</p><p id=b>abc</p>", ["a"]),
    # --- misc pseudo-classes (pseudo_classes.go:306-458) ---
    (":input", "<div><input id=a><select id=b></select><textarea id=c></textarea><button id=d></button><p id=e></p></div>", ["a", "b", "c", "d"]),
    ("p:empty", "<p id=a>  </p><p id=b>x</p><p id=c><span></span></p>", ["a"]),
    (":root", "<div id=a></div>", ["<html>"]),
    ("a:link", '<a id=a href=/x></a><a id=b></a>', ["a"]),
    ("p:lang(en)", '<div lang=en-GB><p id=a></p></div><div lang=fr><p id=b></p></div>', ["a"]),
    ("input:enabled", '<input id=a><input id=b disabled>', ["a"]),
    ("input:disabled", '<fieldset disabled><input id=a></fieldset><input id=b>', ["a"]),
    ("input:checked", '<input id=a type=checkbox checked><input id=b type=text checked>', ["a"]),
    (":checked", '<select><option id=c selected>x</option><option id=d>y</option></select>', ["c"]),
    # static never-match set (parser.go:600-602)
    ("a:hover", '<a id=a href=/x></a>', []),
    ("a:visited", '<a id=a href=/x></a>', []),
    # --- escapes and comments ---
    (r".foo\.bar", '<p id=a class="foo.bar"></p><p id=b class="foo bar"></p>', ["a"]),
    (r"#\31 23", '<p id=a></p>', []),  # element with id "123" absent
    (r"#\31 23", '<p id="123"></p><p id=b></p>', ["123"]),
    ("div/* comment */p", "<div><p id=a></p></div>", ["a"]),
    # --- universal + groups ---
    ("*", "<div id=a><p id=b></p></div>",
     ["<html>", "<head>", "<body>", "a", "b"]),
    ("h1, .x, [data-k=v]", '<h1 id=a></h1><p id=b class=x></p><p id=c data-k=v></p><p id=d></p>', ["a", "b", "c"]),
]


@pytest.mark.parametrize("sel,html,expected", CASES, ids=[c[0] for c in CASES])
def test_cascadia_table(sel, html, expected):
    assert ids(html, sel) == expected


INVALID = [
    "div[",           # EOF in attribute selector
    "[foo=bar",       # unterminated
    "p::",            # empty pseudo-element
    "::before",       # pseudo-elements rejected on the Compile path
    "p::before",
    "div)",           # leftover bytes (selector.go:38-40,71-73)
    "p:nonsense",     # unknown pseudoclass
    "p:nth-child(x)", # bad an+b
    "p:nth-child(2",  # missing ')'
    ",p",             # group can't start with comma
    "[*=x]",          # identifier expected
    "p[title=\"unterminated]",
    "a >",            # dangling combinator
    "123",            # type selector can't start with a digit
]


@pytest.mark.parametrize("sel", INVALID)
def test_invalid_selectors_match_nothing(sel):
    """goquery compileMatcher maps parse errors to invalidMatcher
    (type.go:166-176, 201-203): Find returns nothing, never raises."""
    with pytest.raises(SelectorError):
        parse_group(sel)
    assert ids("<div id=a><p id=b>x</p></div>", sel) == []


def test_invalid_rule_falls_back_to_general_parser():
    """A rule with an unsupported/invalid selector must take the general
    path, like goquery's never-matching Find → customParser 'nothing
    extracted' → fallback (reference extractor/readability.go:199-207)."""
    from ukeeper_readability_spark.engine.extract import extract_document

    para = "Long enough paragraph text to score. " * 20
    html = f"<html><body><div><p>{para}</p><p>{para}</p></div></body></html>"
    res = extract_document(html, "http://e.com/x", rule_selector="div[")
    assert res["metrics"]["general_parse"] == 1
    assert res["metrics"]["rule_hit"] == 0
    assert "Long enough paragraph" in res["content"]


def test_attr_selector_rule_extracts_rule_path():
    """Attribute-selector rules now hit the rule path (VERDICT r2 §missing 1:
    previously [attr=v] was silently mis-parsed and fell back)."""
    from ukeeper_readability_spark.engine.extract import extract_document

    html = (
        "<html><body>"
        '<div itemprop="articleBody"><p>Wanted text.</p></div>'
        "<div><p>Boilerplate sidebar text here.</p></div>"
        "</body></html>"
    )
    res = extract_document(
        html, "http://e.com/x", rule_selector="div[itemprop=articleBody] p"
    )
    assert res["metrics"]["rule_hit"] == 1
    assert res["content"] == "Wanted text."
    assert "sidebar" not in res["content"]


def test_selector_cache_isolation():
    """Invalid selectors cache as never-match without poisoning valid ones."""
    html = "<div><p id=a>x</p></div>"
    assert ids(html, "p") == ["a"]
    assert ids(html, "p[") == []
    assert ids(html, "p") == ["a"]


def test_selector_fuzz_never_crashes():
    """Arbitrary selector strings either compile or raise SelectorError —
    goquery feeds user input (POST /api/rule) straight to the compiler, so
    no other exception class may escape; compiled matchers must never throw
    while matching."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    doc = parse(
        '<div id=a class="x y"><p lang=en title="t u">text</p>'
        "<span></span><p>2nd</p><!-- c --></div>"
    )

    alphabet = st.sampled_from(list("ab1 .#:[]()>+~*=\"'\\,|!^$-n"))

    @given(st.text(alphabet=alphabet, max_size=40))
    @settings(max_examples=800, deadline=None)
    def check(sel):
        try:
            g = parse_group(sel)
        except SelectorError:
            pass
        else:
            find_all(doc, g)  # matching must not raise
        find_all(doc, sel)  # string path: invalid → [] (never raises)

    check()


def test_hex_escape_surrogate_yields_replacement():
    """Go string(rune(0xD800)) is U+FFFD (cascadia parser.go hex escapes);
    Python chr() would yield a lone surrogate — pin the Go behavior."""
    # attribute value written via a surrogate hex escape can only match a
    # literal U+FFFD attribute, never a surrogateescape byte
    assert ids('<p id=a title="�"></p>', r'[title="\d800 "]') == ["a"]
    assert ids('<p id=a title="�"></p>', r'[title="\dfff "]') == ["a"]
    # out-of-range stays U+FFFD too (Go rune overflow)
    assert ids('<p id=a title="�"></p>', r'[title="\110000 "]') == ["a"]


def test_i_flag_simple_fold_not_full_fold():
    """strings.EqualFold is SIMPLE folding: 'ß' never equals 'SS'/'ss'."""
    assert ids('<p id=a title="ß"></p>', '[title="SS" i]') == []
    assert ids('<p id=a title="ß"></p>', '[title="ss" i]') == []
    assert ids('<p id=a title="ß"></p>', '[title="ß" i]') == ["a"]
    # Kelvin sign folds to k in both engines (3-member simple-fold cycle)
    assert ids('<p id=a title="K"></p>', '[title="k" i]') == ["a"]


def test_i_flag_simple_fold_orbits():
    """strings.EqualFold equates whole SimpleFold ORBITS, including pairs of
    distinct lowercase runes lower() can't collapse (unicode.SimpleFold
    cycles; FOLD_ORBIT_EXCEPTIONS generated by tools/gen_fold_orbits.py)."""
    # '\u017f' long s \u2261 's' (orbit {S, s, \u017f})
    assert ids('<p id=a title="\u017f"></p>', '[title="s" i]') == ["a"]
    assert ids('<p id=a title="s"></p>', '[title="\u017f" i]') == ["a"]
    # '\u03c2' final sigma \u2261 '\u03c3' sigma \u2261 '\u03a3'
    assert ids('<p id=a title="\u03c2"></p>', '[title="\u03c3" i]') == ["a"]
    assert ids('<p id=a title="\u03c2"></p>', '[title="\u03a3" i]') == ["a"]
    # \u00b5 micro \u2261 \u03bc greek mu \u2261 \u039c capital mu
    assert ids('<p id=a title="\u00b5"></p>', '[title="\u03bc" i]') == ["a"]
    assert ids('<p id=a title="\u039c"></p>', '[title="\u00b5" i]') == ["a"]
    # iota orbit: \u03b9 \u2261 \u0399 \u2261 U+0345 \u2261 U+1FBE
    assert ids('<p id=a title="\u1fbe"></p>', '[title="\u03b9" i]') == ["a"]
    assert ids('<p id=a title="\u0345"></p>', '[title="\u0399" i]') == ["a"]
    # ~= word-include branch folds orbits too
    assert ids('<p id=a class="\u03c2 x"></p>', '[class~="\u03c3" i]') == ["a"]
    # Turkish-conditional \u0130/\u0131 are NOT fold-equal in Go (status T)
    assert ids('<p id=a title="\u0131"></p>', '[title="I" i]') == []
    assert ids('<p id=a title="\u0131"></p>', '[title="i" i]') == []
    assert ids('<p id=a title="\u0130"></p>', '[title="i" i]') == []
    # orbits never cross: \u03c3 does not match s
    assert ids('<p id=a title="\u03c3"></p>', '[title="s" i]') == []


def test_i_flag_include_splits_go_whitespace_only():
    """[k~=v i] splits on ' \\t\\r\\n\\f' exactly — NBSP and other Unicode
    whitespace are part of the token, matching cascadia (selector.go)."""
    # NBSP joins the tokens: "one\u00a0two" is a single word
    assert ids('<p id=a class="one\u00a0two"></p>', '[class~="one" i]') == []
    assert ids('<p id=a class="one\u00a0two"></p>', '[class~="one\u00a0two" i]') == ["a"]
    # form-feed is a separator in both branches
    assert ids('<p id=a title="one\ftwo"></p>', '[title~="TWO" i]') == ["a"]


RE2_REJECTED = [
    # construct Python re accepts, RE2 (Go regexp) rejects → invalid matcher
    r"[x#=(?=foo)]",          # lookahead
    r"[x#=(?!foo)]",          # negative lookahead
    r"[x#=(?<=a)b]",          # lookbehind
    r"[x#=(?<!a)b]",          # negative lookbehind
    r"[x#=(a)\1]",            # numeric backreference
    r"[x#=(?P<g>a)(?P=g)]",   # named backreference
    r"[x#=a\Z]",              # \Z (RE2 spells it \z)
    r"[x#=a++]",              # possessive quantifier
    r"[x#=a*+]",
    r"[x#=a?+]",
    r"[x#=a{1,2}+]",          # possessive interval
    r"[x#=(?>ab)]",           # atomic group
    r"[x#=(?(1)a|b)]",        # conditional
    r"[x#=[\b]]",             # backspace class escape (RE2: error)
    r"p:matches((?=x)y)",
    r"p:matchesown((a)\1)",
    r"[x#=(?#note)a]",        # comment group (RE2: error)
    r"[x#=a\u0061b]",        # \uXXXX escape (RE2 spells it \x{...})
    r"[x#=a\U00000061b]",     # \UXXXXXXXX escape
    r"[x#=\N{BULLET}a]",      # \N{NAME} escape
    r"[x#=[\u0061]b]",       # \u inside a character class too
    r"p:matches((?#c)x)",
    r"p:matchesown(a\u0062b)",
]


@pytest.mark.parametrize("sel", RE2_REJECTED)
def test_non_re2_regex_rejected_to_invalid_matcher(sel):
    with pytest.raises(SelectorError):
        parse_group(sel)
    html = '<p id=a x="foofoo">foofoo</p>'
    assert ids(html, sel) == []


RE2_ACCEPTED = [
    # common grammar both engines share — must still work
    (r"[href#=^https?://]", '<a id=a href="http://x"></a><a id=b href="ftp://x"></a>', ["a"]),
    (r"[x#=^a{1,2}b$]", '<p id=a x="aab"></p><p id=b x="aaab"></p>', ["a"]),
    (r"[x#=(?i)HeLLo]", '<p id=a x="hello"></p>', ["a"]),       # leading inline flag
    (r"[x#=(?:ab)+c]", '<p id=a x="ababc"></p>', ["a"]),
    (r"[x#=\d+\.\d+]", '<p id=a x="v1.25"></p><p id=b x="vX"></p>', ["a"]),
    (r"[x#=[a-c]+z]", '<p id=a x="abcz"></p><p id=b x="dz"></p>', ["a"]),
    (r"p:matches(^\s*Item\s\d+$)", "<p id=a>Item 42</p><p id=b>Item x</p>", ["a"]),
]


@pytest.mark.parametrize("sel,html,expected", RE2_ACCEPTED,
                         ids=[c[0] for c in RE2_ACCEPTED])
def test_re2_common_grammar_still_matches(sel, html, expected):
    assert ids(html, sel) == expected


def test_regex_fuzz_never_crashes():
    """Extend the selector fuzz to the regex pseudo-class arms."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    doc = parse('<div x="ab12">ab12<p y="zz">zz</p></div>')
    frag = st.text(alphabet=list("ab12().*+?\\[]{}^$|=<!PgZz,"), max_size=12)

    @given(frag, st.sampled_from(["[x#=%s]", "p:matches(%s)", "p:matchesown(%s)"]))
    @settings(max_examples=500, deadline=None)
    def check(body, tmpl):
        sel = tmpl % body
        try:
            g = parse_group(sel)
        except SelectorError:
            pass
        else:
            find_all(doc, g)
        find_all(doc, sel)  # string path never raises

    check()
