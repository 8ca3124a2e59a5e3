"""normalizeLinks parity cases (extractor/readability_test.go:163-176)."""

from ukeeper_readability_spark.engine.links import go_quote, normalize_links


def test_normalize_links_basic():
    inp = (
        'blah <img src="/aaa.png"/> sdfasd <a href="/blah2/aa.link">something</a>'
        ' blah33 <img src="//aaa.com/xyz.jpg">xx</img>'
    )
    out, links = normalize_links(inp, "http://ukeeper.com/blah")
    assert out == (
        'blah <img src="http://ukeeper.com/aaa.png"/> sdfasd '
        '<a href="http://ukeeper.com/blah2/aa.link">something</a> blah33 '
        '<img src="http://aaa.com/xyz.jpg">xx</img>'
    )
    assert len(links) == 3


def test_normalize_links_absolute_untouched():
    inp = (
        '<body>\n\t\t<img class="alignright size-full wp-image-944214 lazyloadableImage '
        'lazyLoad-fadeIn" alt="View Page Source" width="308" height="508" '
        'data-original="http://cdn1.tnwcdn.com/wp-content/blogs.dir/1/files/2016/01/page-source.jpg" '
        'src="http://cdn1.tnwcdn.com/wp-content/blogs.dir/1/files/2016/01/page-source.jpg"></body>'
    )
    _, links = normalize_links(inp, "http://ukeeper.com/blah")
    assert links == [
        "http://cdn1.tnwcdn.com/wp-content/blogs.dir/1/files/2016/01/page-source.jpg"
    ]


def test_empty_link_resolves_to_base():
    # Go: baseURL.Parse("") == base → changed → global replace of `""`
    out, links = normalize_links('<a href="">x</a>', "http://u.com/base")
    assert links == ["http://u.com/base"]
    assert out == '<a href="http://u.com/base">x</a>'


def test_go_quote():
    assert go_quote("abc") == '"abc"'
    assert go_quote('a"b') == '"a\\"b"'
    assert go_quote("a\\b") == '"a\\\\b"'
