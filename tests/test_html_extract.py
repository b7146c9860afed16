"""Unit tests for the HTML main-content extractor (boilerplate strip)."""

from pdfminer_six_spark.core.html import extract_main_text


def test_main_element_wins():
    html = (
        "<html><body><nav>Home About</nav>"
        "<main><p>Real content here.</p><p>Second para.</p></main>"
        "<footer>Copyright</footer></body></html>"
    )
    assert extract_main_text(html) == "Real content here.\nSecond para."


def test_role_main_attribute():
    html = (
        "<html><body><div role='main'><p>Payload</p></div>"
        "<aside>ads ads ads ads ads</aside></body></html>"
    )
    assert extract_main_text(html) == "Payload"


def test_densest_block_fallback():
    # no <main>: the densest block (the article div) wins over nav/footer
    html = (
        "<html><body><nav><ul><li>a</li><li>b</li></ul></nav>"
        "<div id='art'><p>This is a long paragraph with plenty of text "
        "content that dominates the page by sheer volume of words.</p>"
        "<p>And another one to be safe.</p></div>"
        "<footer>tiny</footer></body></html>"
    )
    out = extract_main_text(html)
    assert "long paragraph" in out
    assert "tiny" not in out and "a" != out


def test_script_style_dropped():
    html = (
        "<html><head><style>.x{}</style><script>var x='<main>fake</main>'"
        "</script></head><body><main>visible</main></body></html>"
    )
    assert extract_main_text(html) == "visible"


def test_nested_boilerplate_inside_main():
    html = (
        "<main><nav>inner nav junk</nav><p>kept text</p></main>"
    )
    assert extract_main_text(html) == "kept text"


def test_malformed_html_no_crash():
    html = "<main><p>unclosed <div><b>text</main><<<>>>"
    out = extract_main_text(html)
    assert "unclosed" in out and "text" in out


def test_whitespace_normalization():
    html = "<main><p>  a   b \n\n c  </p><p></p><p>d</p></main>"
    assert extract_main_text(html) == "a b c\nd"


def test_entities_unescaped():
    html = "<main><p>x &amp; y &lt; z</p></main>"
    assert extract_main_text(html) == "x & y < z"
