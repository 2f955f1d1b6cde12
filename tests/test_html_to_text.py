"""Plain-text renderer tests mirroring the reference's embedded suite
(`src/html_to_text.rs:159-244`), plus pipeline-integration checks."""

from trek_spark.extract.html_to_text import clean_text, html_to_text


def test_basic_html_to_text():
    text = html_to_text("""
        <p>First paragraph.</p>
        <p>Second paragraph.</p>
    """)
    assert "First paragraph" in text
    assert "Second paragraph" in text
    assert text.index("First") < text.index("Second")


def test_links_preserved_as_text():
    text = html_to_text(
        '<p>Check out <a href="https://example.com">this link</a>'
        ' for more info.</p>')
    assert "Check out this link for more info" in text


def test_multiple_links_in_content():
    text = html_to_text("""
        <p>Here's a paragraph with <a href="https://example.com">a link</a> in it.</p>
        <p>And another with <a href="https://test.com">multiple</a> <a href="https://test2.com">links</a>.</p>
    """)
    assert "Here's a paragraph with a link in it" in text
    assert "And another with multiple links" in text


def test_lists():
    text = html_to_text("""
        <ul>
            <li>First item</li>
            <li>Second item</li>
        </ul>
    """)
    assert "• First item" in text
    assert "• Second item" in text


def test_headings():
    text = html_to_text("""
        <h1>Main Title</h1>
        <p>Some content.</p>
        <h2>Subtitle</h2>
        <p>More content.</p>
    """)
    for frag in ("Main Title", "Some content", "Subtitle", "More content"):
        assert frag in text


def test_skip_scripts_and_styles():
    text = html_to_text("""
        <p>Visible content</p>
        <script>console.log('invisible');</script>
        <style>body { color: red; }</style>
        <p>More visible content</p>
    """)
    assert "console.log" not in text
    assert "color: red" not in text
    assert "Visible content" in text
    assert "More visible content" in text


def test_image_alt_text():
    text = html_to_text(
        '<p>Here\'s an image: <img src="test.jpg" alt="Test description"></p>')
    assert "[Image: Test description]" in text


def test_hr_and_br():
    text = html_to_text("<p>a<br>b</p><hr><p>c</p>")
    assert "a\nb" in text
    assert "---" in text


def test_clean_text_collapses_blank_runs():
    assert clean_text("a\n\n\n\nb") == "a\n\nb"
    assert clean_text("\n\n  x   y  \n\n") == "x y"


def test_pipeline_emits_content_text():
    from trek_spark.extract.pipeline import trek_parse
    r = trek_parse("<html><body><article><h1>T</h1><p>Hello world, this is "
                   "a long enough paragraph of prose for extraction to keep."
                   "</p><p>Second paragraph with more prose content here."
                   "</p></article></body></html>")
    t = r["content_text"]
    assert "Hello world" in t
    assert "Second paragraph" in t
    assert "#" not in t  # plain text, not markdown
