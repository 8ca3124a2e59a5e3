"""Adoption agency / active formatting reconstruction (HTML5 §13.2.6.4.7).

Misnested formatting is ubiquitous in web-scale HTML; x/net/html implements the
full algorithm, so per-turn parity on such pages requires it. Expected strings
are the normative HTML5 tree-construction outcomes (same as browsers and
x/net/html render).
"""

from ukeeper_readability_spark.htmldom import outer_html, parse


def body_of(s: str) -> str:
    out = outer_html(parse(s))
    start = out.index("<body>") + 6
    return out[start : out.rindex("</body>")]


def test_classic_misnest():
    assert body_of("<p>1<b>2<i>3</b>4</i>5</p>") == "<p>1<b>2<i>3</i></b><i>4</i>5</p>"


def test_reconstruction_across_paragraphs():
    assert body_of("<p><b>x</p><p>y</p>") == "<p><b>x</b></p><p><b>y</b></p>"


def test_implied_anchor_close():
    assert (
        body_of('<a href="1">one<a href="2">two</a>')
        == '<a href="1">one</a><a href="2">two</a>'
    )


def test_formatting_span_over_block():
    assert (
        body_of("<b>bold<div>still bold</div>after</b>")
        == "<b>bold<div>still bold</div>after</b>"
    )


def test_b_i_u_ladder():
    # the classic triple-ladder case
    assert (
        body_of("<b>1<i>2<u>3</b>4</u>5</i>6")
        == "<b>1<i>2<u>3</u></i></b><i><u>4</u>5</i>6"
    )


def test_noahs_ark_caps_reconstruction():
    # only 3 identical entries survive in the formatting list: the text after
    # the blocks is wrapped at most 3-deep, not 4
    out = body_of("<b><b><b><b></p>x")
    assert out.count("<b>") <= 5  # 4 originals + capped reconstruction


def test_anchor_link_density_parity():
    """Reconstructed <a> must be seen by link-density scoring: the anchor that
    spans a div boundary contributes its text to the link total."""
    from ukeeper_readability_spark.engine.readability import Document

    html = (
        "<html><body><div class='content'>"
        "<p>plain paragraph with enough words to be scored as a candidate, yes.</p>"
        "<a href='/x'>anchor text<div>deep inside anchor</div></a>"
        "</div></body></html>"
    )
    doc = Document(html)
    doc.content_with_html()  # must not crash; tree contains the adopted <a>
