"""Property-based robustness: the extraction contract is 'never raises'
on arbitrary input (the Spark UDF wraps per-document errors, but the
library itself should survive garbage without tripping that net), and
DOM parse→serialize→parse reaches a fixpoint."""

from hypothesis import given, settings, strategies as st

from trek_spark.dom.node import serialize
from trek_spark.dom.parser import parse_html
from trek_spark.extract.html_to_text import html_to_text
from trek_spark.extract.pipeline import trek_parse

# text with plenty of markup-ish characters to stress the tokenizer
_markupish = st.text(
    alphabet=st.sampled_from(list(
        "<>&=\"'/abcdiv spn!-[]{}()`*_#:;.\n\t\\0123456789")),
    max_size=400)

_tags = st.sampled_from(
    ["div", "p", "span", "table", "pre", "li", "ul", "a", "h2", "img",
     "noscript", "script", "sup", "template", "svg", "math", "iframe"])


@st.composite
def _nested_html(draw, depth=0):
    if depth >= 4 or draw(st.booleans()):
        return draw(_markupish)
    tag = draw(_tags)
    inner = "".join(draw(st.lists(_nested_html(depth=depth + 1),  # type: ignore[call-arg]
                                  max_size=3)))
    attrs = draw(st.sampled_from(
        ["", ' class="x y"', ' style="display:none"', ' hidden',
         ' href="#fn1"', ' src="a.png" width="10"']))
    return f"<{tag}{attrs}>{inner}</{tag}>"


@settings(max_examples=60, deadline=None)
@given(_markupish)
def test_trek_parse_never_raises_on_garbage(s):
    r = trek_parse(s, "https://fuzz.example/x")
    assert isinstance(r["content_markdown"], str)
    assert isinstance(r["content_text"], str)
    assert isinstance(r["word_count"], int)


@settings(max_examples=40, deadline=None)
@given(_nested_html())
def test_trek_parse_never_raises_on_markup(s)  :
    r = trek_parse(f"<html><body>{s}</body></html>")
    assert isinstance(r["content_markdown"], str)


@settings(max_examples=60, deadline=None)
@given(_nested_html())
def test_parse_serialize_fixpoint(s):
    """serialize∘parse is a fixpoint after one round trip: the first pass
    normalizes (implied closes, entity escaping), the second must be
    byte-stable — the property the in-place DOM passes rely on."""
    once = serialize(parse_html(s))
    twice = serialize(parse_html(once))
    assert once == twice


@settings(max_examples=40, deadline=None)
@given(_markupish)
def test_html_to_text_never_raises(s):
    assert isinstance(html_to_text(s), str)


@settings(max_examples=40, deadline=None)
@given(_nested_html(), st.booleans(), st.booleans(), st.booleans())
def test_option_modes_never_raise(s, md, sep, dbg):
    """Every combination of output/debug options upholds the
    never-raises contract and the content-field typing rules."""
    r = trek_parse(s, "https://fuzz.example/opts",
                   {"markdown": md, "separate_markdown": sep, "debug": dbg})
    assert isinstance(r["content"], str)
    if sep:
        assert isinstance(r["content_markdown"], str)
    else:
        assert r["content_markdown"] is None
