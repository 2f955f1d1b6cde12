"""DOM layer unit tests: tolerant parsing, serialization, selectors."""

from trek_spark.dom import (
    Node,
    body_of,
    inner_html,
    matches,
    parse_html,
    select,
    serialize,
)


def roundtrip(html: str) -> str:
    return serialize(parse_html(html))


def test_implied_p_close():
    assert roundtrip("<p>one<p>two") == "<p>one</p><p>two</p>"


def test_implied_li_close():
    assert roundtrip("<ul><li>a<li>b</ul>") == "<ul><li>a</li><li>b</li></ul>"


def test_implied_table_cells():
    out = roundtrip("<table><tr><td>x<td>y<tr><td>z</table>")
    assert out == ("<table><tr><td>x</td><td>y</td></tr>"
                   "<tr><td>z</td></tr></table>")


def test_nested_list_not_overclosed():
    out = roundtrip("<ul><li>a<ul><li>b</li></ul></li><li>c</li></ul>")
    assert out == "<ul><li>a<ul><li>b</li></ul></li><li>c</li></ul>"


def test_void_elements():
    assert roundtrip("<p>a<br>b<img src='x.png'></p>") == \
        '<p>a<br>b<img src="x.png"></p>'


def test_script_raw_text():
    html = "<script>if (a<b) { x(); }</script>"
    assert roundtrip(html) == html


def test_stray_end_tag_ignored():
    assert roundtrip("<div>a</span></div>") == "<div>a</div>"


def test_entity_decode_and_escape():
    out = roundtrip("<p>a &amp; b &lt; c</p>")
    assert out == "<p>a &amp; b &lt; c</p>"


def test_attr_entity():
    out = roundtrip('<a href="?a=1&amp;b=2">x</a>')
    assert out == '<a href="?a=1&amp;b=2">x</a>'


def test_body_of_fragment():
    doc = parse_html("<p>frag</p>")
    body = body_of(doc)
    assert body.tag == "body"
    assert inner_html(body) == "<p>frag</p>"


def test_selector_class_id_attr():
    doc = parse_html('<div class="a b" id="x" data-test="promo-box">t</div>')
    el = select(doc, "div")[0]
    assert matches(el, ".a")
    assert matches(el, "#x")
    assert matches(el, "div.b#x")
    assert matches(el, '[data-test*="promo"]')
    assert not matches(el, ".c")


def test_selector_case_insensitive_flag():
    doc = parse_html('<div class="Ad-Banner">t</div>')
    el = select(doc, "div")[0]
    assert matches(el, '[class^="ad-" i]')
    assert not matches(el, '[class^="ad-"]')


def test_selector_not():
    doc = parse_html('<script type="math/tex">x</script><script>y</script>')
    els = select(doc, "script")
    assert not matches(els[0], 'script:not([type^="math/"])')
    assert matches(els[1], 'script:not([type^="math/"])')


def test_selector_descendant():
    doc = parse_html('<div class="footnote"><ol><li>x</li></ol></div>')
    ol = select(doc, "ol")[0]
    assert matches(ol, "div.footnote ol")
    assert not matches(ol, "section.footnotes ol")


def test_unwrap_and_detach():
    doc = parse_html("<div><span>a</span><b>c</b></div>")
    body = body_of(doc)
    div = select(body, "div")[0]
    div.unwrap()
    assert inner_html(body) == "<span>a</span><b>c</b>"


def test_deep_nesting_no_recursion_error():
    html = "<div>" * 3000 + "x" + "</div>" * 3000
    doc = parse_html(html)
    assert doc.text_content() == "x"
    assert "x" in serialize(doc)
