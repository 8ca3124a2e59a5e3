"""SVG/MathML foreign content (HTML5 §13.2.6.5) — self-closing honored,
camelCase restored, integration points and breakout tags."""

from ukeeper_readability_spark.htmldom import outer_html, parse


def body_of(s: str) -> str:
    o = outer_html(parse(s))
    return o[o.index("<body>") + 6 : o.rindex("</body>")]


def test_self_closing_does_not_swallow_siblings():
    assert (
        body_of('<svg viewBox="0 0 24 24"><path d="M1 2"/><circle r="5"/></svg>after')
        == '<svg viewBox="0 0 24 24"><path d="M1 2"></path><circle r="5"></circle></svg>after'
    )


def test_camelcase_tags_and_attrs():
    out = body_of('<svg><linearGradient gradientUnits="u"/><text>t</text></svg>')
    assert "<linearGradient" in out and 'gradientUnits="u"' in out


def test_integration_point_returns_to_html():
    assert (
        body_of("<svg><foreignObject><div>html inside</div></foreignObject></svg>t")
        == "<svg><foreignObject><div>html inside</div></foreignObject></svg>t"
    )


def test_breakout_tag_exits_foreign_content():
    assert body_of("<svg><div>breakout</div>") == "<svg></svg><div>breakout</div>"


def test_math():
    assert body_of("<math><mi>x</mi><mo>+</mo></math>d") == "<math><mi>x</mi><mo>+</mo></math>d"


def test_extraction_with_inline_svg_icons():
    from ukeeper_readability_spark.engine import extract_document

    html = (
        "<html><head><title>T</title></head><body><div class='content'>"
        "<p>article paragraph with an inline icon <svg viewBox='0 0 16 16'>"
        "<path d='M0 0h16v16z'/></svg> and plenty of surrounding words, commas, "
        "and sentences to make it score well.</p>"
        "<p>second paragraph keeps the article going with even more text.</p>"
        "</div></body></html>"
    )
    r = extract_document(html, "http://e.com/a")
    assert "article paragraph with an inline icon" in r["content"]
    assert "and plenty of surrounding words" in r["content"]
    assert "M0 0h16v16z" not in r["content"]  # path data never leaks into text
