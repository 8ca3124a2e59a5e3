"""CSS selector engine tests (goquery/cascadia subset used by rules)."""

from ukeeper_readability_spark.htmldom import find_all, parse


HTML = """
<html><body>
  <div id="content" class="content container">
    <p class="lead big">one</p>
    <section><p>two</p></section>
    <span class="lead">not-p</span>
  </div>
  <div class="other"><p>three</p></div>
  <p id="top">four</p>
</body></html>
"""


def _texts(sel):
    from ukeeper_readability_spark.htmldom import node_text

    return [node_text(n).strip() for n in find_all(parse(HTML), sel)]


def test_tag():
    assert _texts("p") == ["one", "two", "three", "four"]


def test_class():
    assert _texts(".lead") == ["one", "not-p"]
    assert _texts("p.lead") == ["one"]
    assert _texts(".lead.big") == ["one"]


def test_id():
    assert _texts("#top") == ["four"]
    assert _texts("p#top") == ["four"]
    assert _texts("div#content p") == ["one", "two"]


def test_descendant():
    assert _texts(".content p") == ["one", "two"]
    assert _texts("div p") == ["one", "two", "three"]


def test_child_combinator():
    assert _texts("div > p") == ["one", "three"]
    assert _texts("#content > p") == ["one"]
    assert _texts("body > p") == ["four"]


def test_groups():
    assert _texts("#content p, .other p") == ["one", "two", "three"]
    # reference rule from readability_test.go:347 — group order does not
    # affect document-order results
    assert _texts(".other p, #content p") == ["one", "two", "three"]


def test_multi_class_attribute():
    # class attribute matching is whitespace-token based, not substring
    assert _texts(".content") == ["one\n    two\n    not-p".replace("\n    ", " ")] or len(
        find_all(parse(HTML), ".content")
    ) == 1
    assert find_all(parse(HTML), ".conta") == []


def test_no_match():
    assert _texts(".does-not-exist") == []
    assert _texts("#nope p") == []
