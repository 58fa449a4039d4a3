"""HTML → text extraction with bluemonday empty-policy parity.

Reimplements the semantics of the reference's Bloblang ``strip_html``
method (``/root/reference/internal/bloblang/query/methods_strings.go:1920-1964``),
which sanitises through ``bluemonday.NewPolicy()`` — an *empty* allowlist
policy (bluemonday pinned at v1.0.27, ``/root/reference/go.mod:98``).

Observable behaviour of that policy over the ``x/net/html`` tokenizer:

- every start / end / self-closing tag is dropped (nothing substituted);
- HTML comments, doctypes and processing instructions are dropped;
- the *content* of the default skip-content elements
  (``frame frameset iframe noembed noframes noscript nostyle object
  script style title``) is dropped entirely;
- text tokens are entity-decoded by the tokenizer and re-emitted by
  ``Token.String()`` with Go ``html.EscapeString`` escaping, i.e. the
  five characters ``& ' < > "`` become ``&amp; &#39; &lt; &gt; &#34;``;
- nothing is inserted between adjacent text nodes.

This module reproduces exactly that, so extracted text is byte-identical
per url versus the reference (the BASELINE.json per-row invariant).
"""

from __future__ import annotations

from html.parser import HTMLParser

# bluemonday Policy.addDefaultSkipElementContent() (sanitize defaults).
SKIP_CONTENT_ELEMENTS = frozenset(
    (
        "frame",
        "frameset",
        "iframe",
        "noembed",
        "noframes",
        "noscript",
        "nostyle",
        "object",
        "script",
        "style",
        "title",
    )
)

# Go html.EscapeString escape set (x/net/html escape.go).
_GO_ESCAPE = str.maketrans(
    {"&": "&amp;", "'": "&#39;", "<": "&lt;", ">": "&gt;", '"': "&#34;"}
)


def go_escape(text: str) -> str:
    """Go ``html.EscapeString``: escape ``& ' < > "`` only."""
    return text.translate(_GO_ESCAPE)


class _Sanitizer(HTMLParser):
    """Tag-stripping tokenizer pass.

    ``convert_charrefs=True`` decodes entity and numeric character
    references inside text (mirroring the x/net/html tokenizer); kept
    text is re-escaped Go-style on output.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._out: list[str] = []
        self._skip_tag: str | None = None
        self._skip_depth = 0

    # -- tags ---------------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if self._skip_tag is not None:
            if tag == self._skip_tag:
                self._skip_depth += 1
            return
        if tag in SKIP_CONTENT_ELEMENTS:
            self._skip_tag = tag
            self._skip_depth = 1

    def handle_startendtag(self, tag: str, attrs) -> None:
        # Void / self-closing tags produce no content and never open a
        # skip region.
        return

    def handle_endtag(self, tag: str) -> None:
        if self._skip_tag is not None and tag == self._skip_tag:
            self._skip_depth -= 1
            if self._skip_depth <= 0:
                self._skip_tag = None

    # -- content ------------------------------------------------------
    def handle_data(self, data: str) -> None:
        if self._skip_tag is None and data:
            self._out.append(data)

    # comments / decls / PIs dropped (default no-op handlers)

    def result(self) -> str:
        return go_escape("".join(self._out))


def strip_html(html: str | bytes) -> str:
    """Strip all HTML tags, reproducing bluemonday empty-policy output.

    >>> strip_html("<p>the plain <strong>old text</strong></p>")
    'the plain old text'
    """
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    s = _Sanitizer()
    s.feed(html)
    s.close()
    return s.result()


def strip_html_batch(htmls) -> list[str]:
    """Row loop over one Arrow batch. HTML tokenization is inherently
    sequential per document; parallelism comes from Ray scheduling many
    batches concurrently, not from vectorizing inside the batch."""
    out = []
    for h in htmls:
        out.append(strip_html(h) if h is not None else None)
    return out
