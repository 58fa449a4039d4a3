"""strip_html: bluemonday empty-policy byte parity."""

from bento_ray.html import strip_html
from bento_ray.testgen import generate_pages_table


def test_reference_doc_example():
    # methods_strings.go:1926-1929
    assert strip_html("<p>the plain <strong>old text</strong></p>") == \
        "the plain old text"


def test_tags_dropped_nothing_inserted():
    assert strip_html("<div>a</div><div>b</div>") == "ab"
    assert strip_html("<h1>t</h1>x<br/>y") == "txy"


def test_skip_content_elements():
    assert strip_html("a<script>var x=1;</script>b") == "ab"
    assert strip_html("a<style>.c{}</style>b") == "ab"
    assert strip_html("a<title>t</title>b") == "ab"
    assert strip_html("a<iframe>inner</iframe>b") == "ab"


def test_comments_dropped():
    assert strip_html("a<!-- hidden -->b") == "ab"


def test_entity_escaping_roundtrip():
    # tokenizer decodes, Token.String re-escapes Go-style
    assert strip_html("x &amp; y &lt; z &gt; w") == "x &amp; y &lt; z &gt; w"
    assert strip_html("&quot;q&quot;") == "&#34;q&#34;"
    assert strip_html("it's") == "it&#39;s"


def test_bytes_input():
    assert strip_html(b"<p>bytes</p>") == "bytes"


def test_byte_identical_vs_golden_corpus():
    """The per-row invariant: engine text == generator golden text,
    byte for byte, for every url (BASELINE.json input_hint)."""
    t = generate_pages_table(500, seed=42)
    for i in range(t.num_rows):
        got = strip_html(t["html"][i].as_py())
        want = t["text"][i].as_py()
        assert got == want, f"row {i}: {got!r} != {want!r}"


def test_byte_identical_other_seed():
    t = generate_pages_table(200, seed=7)
    for i in range(t.num_rows):
        assert strip_html(t["html"][i].as_py()) == t["text"][i].as_py()


def test_byte_identical_many_seeds():
    """Parity fuzz: fresh grammar corpora across seeds — every page's
    sanitized text must match the generator's golden byte-for-byte."""
    for seed in (0, 1, 13, 99, 12345):
        t = generate_pages_table(80, seed=seed)
        for i in range(t.num_rows):
            assert strip_html(t["html"][i].as_py()) == t["text"][i].as_py(), \
                f"seed={seed} row={i}"


def test_fast_scanner_matches_htmlparser_on_grammar():
    """The fast scanner and the HTMLParser reference implementation
    agree byte-for-byte on the generator grammar (the north-rule
    invariant corpus). On pathological tag soup (unterminated
    comments) they diverge deliberately: the scanner follows Go's
    x/net/html (comment-to-EOF dropped), HTMLParser re-emits text."""
    from bento_ray.html import strip_html, strip_html_reference

    t = generate_pages_table(300, seed=31)
    for i in range(t.num_rows):
        h = t["html"][i].as_py()
        assert strip_html(h) == strip_html_reference(h)


def test_fast_scanner_go_tokenizer_edge_cases():
    from bento_ray.html import strip_html

    # unterminated comment: dropped to EOF (x/net/html semantics)
    assert strip_html("a<!--never closed") == "a"
    # '<' before non-tag char is literal text
    assert strip_html("a < b") == "a &lt; b"
    # quoted attribute containing '>'
    assert strip_html("<a href='x>y'>t</a>") == "t"
    # CDATA elements scan for the literal close tag only
    assert strip_html("<script>var a = '<div>';</script>after") == "after"
    # nested skip-content element (non-CDATA) honours nesting depth
    assert strip_html(
        "<object><object>i</object>also gone</object>tail") == "tail"
    # bogus end tag dropped
    assert strip_html("</ weird>x") == "x"


def test_fast_scanner_cdata_and_tagname_boundaries():
    """Second review pass: CDATA regions close only on the exact tag
    name (with optional whitespace); hyphen/colon tag names don't
    confuse skip-region nesting."""
    cases = [
        "<script>a</scripting>b</script>c",
        "<script>a</ script>b",
        "<title>a</title-x>b</title>c",
        "<SCRIPT>x</sCrIpT>y",
    ]
    from bento_ray.html import strip_html, strip_html_reference

    for h in cases:
        assert strip_html(h) == strip_html_reference(h), h


def test_fast_scanner_parser_parity_third_pass():
    """Third review pass: tag names include '_' and '.'
    (tagfind_tolerant), cdata regions close only on the FULL end tag,
    comments/quote-aware tags are parsed INSIDE skip regions, and
    nested <script> within a skip region enters cdata mode."""
    from bento_ray.html import strip_html, strip_html_reference

    cases = [
        "<object_x>hello</object_x>world",
        "<title.x>a</title.x>b",
        "<script>x</script foo>bar</script>tail",
        "<title><script></title></script>after</title>end",
        "<title><!--</title>--></title>out",
        "<title><div title='</title>'></title>visible",
        "</x=1;<a href=\">\">text",
        "</ title>after<title>gone</title>kept",
        "<script>a</scripting>b</script>c",
    ]
    for h in cases:
        assert strip_html(h) == strip_html_reference(h), h


def test_fast_scanner_terminated_fuzz():
    """Randomized parity fuzz over a fragment corpus whose constructs
    always terminate (unterminated-at-EOF is the documented
    Go-vs-html.parser divergence class, pinned separately)."""
    import random

    from bento_ray.html import strip_html, strip_html_reference

    random.seed(1234)
    frag = ["<p>", "</p>", "<div class='x'>", "</div>", "<script>",
            "</script>", "</script foo>", "<style>", "</style>",
            "<title>", "</title>", "<object_x>", "</object_x>",
            "text ", "&amp;", "&lt;x&gt;", "<!-- c -->",
            "<!doctype h>", "<?pi?>", "<a href=\">\">", "<br/>",
            "<select>", "</select>", "</title >", "</title/>",
            "<sCrIpT>", "</sCrIpT>", "x=1;", "é&#233;", "<é>", "<1>",
            "</ title>", "<div title=\"</title>\">", "a < b ", "> c"]
    for _ in range(1500):
        doc = "".join(random.choices(frag, k=random.randint(1, 14)))
        assert strip_html(doc) == strip_html_reference(doc), repr(doc)


def test_fast_scanner_unterminated_dropped_go_semantics():
    """x/net/html drops an unterminated construct at EOF (the Go
    engine is the byte-parity target; html.parser's close() recovery
    re-emits the tail — the one documented divergence between
    strip_html and strip_html_reference)."""
    from bento_ray.html import strip_html

    assert strip_html("keep<div foo=\"bar") == "keep"
    assert strip_html("keep<!--tail") == "keep"
    assert strip_html("keep<?pi tail") == "keep"
    assert strip_html("keep</div") == "keep"
