"""Byte-parity of the one-shot tokenizer against stdlib html.parser.

The custom scanner (trek_spark/dom/tokenizer.py) must produce the IDENTICAL
callback stream — and therefore the identical DOM — as HTMLParser with
convert_charrefs=True, on the whole golden corpus plus adversarial
constructions. Any divergence is a bug in the scanner by definition: the
187/187 byte-exact fixture outputs were established against the stdlib
tokenizer."""

from html.parser import HTMLParser

from hypothesis import given, settings, strategies as st

from trek_spark.dom.node import serialize
from trek_spark.dom.parser import _TreeBuilder
from trek_spark.dom.tokenizer import scan
from trek_spark.fixtures import load_fixtures


def _tree_stdlib(html: str) -> str:
    tb = _TreeBuilder()
    try:
        tb.feed(html)
        tb.close()
    except Exception:
        pass
    return serialize(tb.root)


def _tree_fast(html: str) -> str:
    tb = _TreeBuilder()
    try:
        scan(html, tb)
    except Exception:
        pass
    return serialize(tb.root)


def _assert_parity(html: str) -> None:
    assert _tree_fast(html) == _tree_stdlib(html), html[:400]


def test_parity_over_golden_corpus():
    for fx in load_fixtures():
        assert _tree_fast(fx.html) == _tree_stdlib(fx.html), fx.name


ADVERSARIAL = [
    "",
    "plain text only",
    "a &amp; b &lt;c&gt; &#65; &#x41; &notareference; &amp no-semicolon",
    "<p>one<p>two<p>three",
    "<div class='x' data-a=\"1\" bare novalue>text</div>",
    "<img src=a.png width=10/><br/><hr />",
    "<script>if (a < b && c > d) { x = '</div>'; }</script>after",
    "<script>unclosed at eof",
    "<style>a { content: '<p>'; }</style>",
    "<SCRIPT>UPPER</SCRIPT>tail",
    "</ script>odd",
    "<script></ScRiPt >done",
    "<!-- comment -->x<!-- unterminated",
    "<!---->empty<!-- -- almost -->",
    "<!doctype html>x",
    "<!DOCTYPE html PUBLIC \"-//W3C//DTD\">y",
    "<![CDATA[raw <b>not bold</b>]]>z",
    "<![if !IE]>ms<![endif]>w",
    "<![bogus keyword]]>v",
    "<?php echo '>'; ?>u",
    "<?incomplete-pi",
    "</>t",
    "</123>s",
    "</div extra attrs>r",
    "<div",
    "<div attr",
    "<div attr='unclosed",
    "< notatag>q",
    "<1notatag>p",
    "text ending with <",
    "text ending with &",
    "text ending with &amp",
    "&#9731; snowman &#x2603;",
    "<a href='x&amp;y=1&notref'>link</a>",
    "<em/>self-closed-nonvoid</em>",
    "<table><td>cell<tr><td>row2",
    "<b><i>misnest</b></i>",
    "<div\x00null>odd-name</div>",
    "<div a=1 a=2>dupe attr</div>",
    "<p title=\"multi\nline\">x</p>",
    "<!>bare decl",
    "<!x>bogus decl",
    "a<b>b</b >c",
    "<svg viewBox='0 0 1 1'><path d='M0 0'/></svg>",
    "\x00\x01 control chars <p>x</p>",
    "<noscript><img src=lazy.png></noscript>",
]


def test_parity_adversarial_cases():
    for html in ADVERSARIAL:
        _assert_parity(html)


_markupish = st.text(
    alphabet=st.sampled_from(list(
        "<>&=\"'/abcdiv spn!-[]{}()`*_#:;.\n\t\\0123456789?")),
    max_size=300)


@settings(max_examples=300, deadline=None)
@given(_markupish)
def test_parity_fuzz_markupish(s):
    _assert_parity(s)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200))
def test_parity_fuzz_unicode(s):
    _assert_parity(s)


# pieces that straddle the fast-start-tag/slow-path boundary: quoted and
# valueless attrs (fast), bare values / missing space / `=`-soup (slow),
# raw-text and self-closing interactions
_FAST_BOUNDARY_PIECES = [
    '<div>', '<div >', '<p class="a b">', "<a href='x&amp;y'>", '<br/>',
    '<br />', '<img src="a.png" alt>', '<input disabled>', '<a b=c>',
    '<a b=c/d>', '<a b = "x">', '<a b=="x">', '<A HREF="X">',
    '<my-tag x:y="1" @click="f()" _z="2">', '<a "b">', '</div>',
    '</ DIV>', '</div >', '< div>', '<div', 'text & more',
    '&lt;&gt;&amp;', '<!-- comment -->', '<!doctype html>',
    '<![CDATA[x]]>', '<?pi data>', '<script>a<b</script>',
    '<script src="s"></script>', '<style>.a{}</style>', '<a b="c>d">',
    "<a b='c>d'>", '<a\tb="c"\nd="e">', '<td>', '<a b="&#65;">',
    '<a b>', '<a -b="1">', '<a 9b="1">', '<tag.x a="1">',
    '<ns:tag a="1">', '<a/b>', '<a /b>', '<a b/>', '<a b="x"/>',
    '\x00', '<a b="\x00">', '<', '<>', '</>', '<!>', '<!x>', 'plain',
    ' ', '﻿', '<a b="x" c>', '<a b c="d">', '<a  b  =  "x"  >',
    '<div CLASS="UP">',
]


def test_parity_fast_path_boundary_fuzz():
    """Seeded combinational fuzz over pieces chosen to land on either
    side of the single-pass start-tag fast path (quoted/valueless attrs
    fast; bare values, missing inter-attr space, =-soup, weird names
    slow) — the fast path must be observationally invisible."""
    import random
    rng = random.Random(42)
    for _ in range(4000):
        s = "".join(rng.choice(_FAST_BOUNDARY_PIECES)
                    for _ in range(rng.randint(1, 8)))
        _assert_parity(s)
