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


def strip_html_reference(html: str | bytes) -> str:
    """HTMLParser-based implementation — the parity reference the fast
    scanner below is fuzz-checked against (tests/test_html.py)."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    s = _Sanitizer()
    s.feed(html)
    s.close()
    return s.result()


# html.parser treats only these as raw-text (CDATA) elements: their
# content is scanned for the literal close tag, never for nested tags.
_CDATA_ELEMENTS = frozenset(("script", "style"))

import functools as _functools
import re as _re


@_functools.lru_cache(maxsize=8)
def _cdata_close_re(tagname: str):
    """`</\\s*name` with a name boundary, case-insensitive — exactly
    what html.parser's cdata mode accepts as a region close."""
    return _re.compile(r"</\s*" + _re.escape(tagname) + r"(?![a-zA-Z0-9\-:])",
                       _re.I)


def _tag_end(s: str, pos: int) -> int:
    """Index of the '>' terminating a tag starting scan at ``pos``,
    honouring quoted attribute values; -1 when unterminated."""
    n = len(s)
    i = pos
    while i < n:
        c = s[i]
        if c == ">":
            return i
        if c == '"' or c == "'":
            j = s.find(c, i + 1)
            if j < 0:
                return -1
            i = j + 1
            continue
        i += 1
    return -1


def _fast_strip(html: str) -> str:
    """Single-pass scanner equivalent to the HTMLParser implementation
    (measured ~5× faster — this is the flagship feed tasks' dominant
    compute). Text segments are entity-decoded individually (decoding
    the concatenation would merge entities split across removed tags)
    then Go-escaped once at the end."""
    import html as _htmlmod

    out: list[str] = []
    i, n = 0, len(html)
    find = html.find

    def emit(seg: str) -> None:
        if seg:
            out.append(_htmlmod.unescape(seg) if "&" in seg else seg)

    while i < n:
        lt = find("<", i)
        if lt < 0:
            emit(html[i:])
            break
        if lt > i:
            emit(html[i:lt])
        nxt = html[lt + 1] if lt + 1 < n else ""
        if nxt == "!":
            if html.startswith("<!--", lt):
                end = find("-->", lt + 4)
                i = n if end < 0 else end + 3
            else:
                end = find(">", lt + 2)
                i = n if end < 0 else end + 1
            continue
        if nxt == "?":
            end = find(">", lt + 2)
            i = n if end < 0 else end + 1
            continue
        if nxt == "/":
            if lt + 2 < n and html[lt + 2].isalpha():
                end = _tag_end(html, lt + 2)
            else:
                # "</" + non-letter → bogus comment until '>' (dropped)
                end = find(">", lt + 2)
            i = n if end < 0 else end + 1
            continue
        if nxt.isalpha():
            j = lt + 1
            k = j
            while k < n and (html[k].isalnum() or html[k] in "-:"):
                k += 1
            tagname = html[j:k].lower()
            end = _tag_end(html, k)
            if end < 0:
                i = n
                continue
            self_closing = html[end - 1] == "/"
            i = end + 1
            if self_closing or tagname not in SKIP_CONTENT_ELEMENTS:
                continue
            # skip-content region
            if tagname in _CDATA_ELEMENTS:
                # html.parser cdata mode: close on `</\s*name` with a
                # NAME BOUNDARY — '</scripting>' must not end <script>
                m = _cdata_close_re(tagname).search(html, i)
                if not m:
                    i = n
                    continue
                end = find(">", m.start())
                i = n if end < 0 else end + 1
                continue
            depth = 1

            def _is_name_boundary(pos: int) -> bool:
                # tag-name chars are alnum plus '-' and ':' (matching
                # the open-tag scanner above)
                return pos >= n or not (html[pos].isalnum() or
                                        html[pos] in "-:")

            while depth and i < n:
                lt2 = find("<", i)
                if lt2 < 0:
                    i = n
                    break
                if html.startswith("</", lt2) and \
                        html[lt2 + 2:lt2 + 2 + len(tagname)].lower() == \
                        tagname and _is_name_boundary(
                            lt2 + 2 + len(tagname)):
                    depth -= 1
                    end = find(">", lt2)
                    i = n if end < 0 else end + 1
                elif html[lt2 + 1:lt2 + 1 + len(tagname)].lower() == \
                        tagname and _is_name_boundary(
                            lt2 + 1 + len(tagname)):
                    end = _tag_end(html, lt2 + 1 + len(tagname))
                    if end >= 0 and html[end - 1] != "/":
                        depth += 1
                    i = n if end < 0 else end + 1
                else:
                    i = lt2 + 1
            continue
        # '<' followed by anything else is literal text
        out.append("<")
        i = lt + 1

    return go_escape("".join(out))


def strip_html(html: str | bytes) -> str:
    """Strip all HTML tags, reproducing bluemonday empty-policy output.

    >>> strip_html("<p>the plain <strong>old text</strong></p>")
    'the plain old text'
    """
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    return _fast_strip(html)


def strip_html_batch(htmls) -> list[str]:
    """Row loop over one Arrow batch. HTML tokenization is inherently
    sequential per document; parallelism comes from Ray scheduling many
    batches concurrently, not from vectorizing inside the batch."""
    out = []
    for h in htmls:
        out.append(strip_html(h) if h is not None else None)
    return out
