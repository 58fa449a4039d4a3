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
    """Full ``</\\s*name\\s*>`` end tag, case-insensitive — exactly
    what html.parser's cdata mode accepts as a region close
    (parse_endtag requires endtagfind to match; ``</script foo>`` or
    ``</script/>`` is handled as data and the region continues)."""
    return _re.compile(r"</\s*" + _re.escape(tagname) + r"\s*>", _re.I)


# tagfind_tolerant (html.parser): a tag name is a letter followed by
# anything that is not whitespace, '/', '>' or NUL — underscores and
# dots are PART of the name ('<object_x>' is tag 'object_x', not
# 'object')
_TAGNAME_STOP = frozenset("\t\n\r\f />\x00")

# endtagfind (html.parser): the well-formed end-tag shape — whitespace
# allowed around a STRICTER name charset, then '>'
_ENDTAGFIND = _re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")


def _is_ascii_alpha(c: str) -> bool:
    """starttagopen is ``<[a-zA-Z]`` — Python's str.isalpha also
    accepts unicode letters, which html.parser does not."""
    return "a" <= c <= "z" or "A" <= c <= "Z"


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
    compute). One unified state machine mirrors the _Sanitizer exactly:
    a (skip_tag, depth) pair tracks the open skip-content region, and
    EVERY construct — comments, declarations, PIs, quote-aware start
    tags, tolerant end tags, raw-text (cdata) elements — is parsed the
    same way whether or not a skip region is open, because html.parser
    keeps tokenizing inside one (a '</title>' inside a nested script's
    cdata or inside a comment must not close the title region). Text
    segments are entity-decoded individually (decoding the
    concatenation would merge entities split across removed tags) then
    Go-escaped once at the end."""
    import html as _htmlmod

    out: list[str] = []
    i, n = 0, len(html)
    find = html.find
    skip_tag: str | None = None
    depth = 0

    def emit(seg: str) -> None:
        # handle_data: dropped while a skip region is open
        if seg and skip_tag is None:
            out.append(_htmlmod.unescape(seg) if "&" in seg else seg)

    def recover(lt: int) -> int:
        # An INCOMPLETE construct at EOF is DROPPED — x/net/html
        # tokenizer semantics (the Go engine this module is
        # byte-parity with): a truncated comment/tag at end of input
        # never becomes a text token. html.parser's close() recovery
        # instead re-emits the tail as data, so strip_html_reference
        # deliberately diverges on this one class (pinned in
        # test_fast_scanner_go_tokenizer_edge_cases; fuzz corpora
        # exclude unterminated-at-EOF constructs for this reason).
        return n

    def end_tag(name: str) -> None:
        # handle_endtag bookkeeping
        nonlocal skip_tag, depth
        if skip_tag is not None and name == skip_tag:
            depth -= 1
            if depth <= 0:
                skip_tag = None

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
                i = recover(lt) if end < 0 else end + 3
            else:
                end = find(">", lt + 2)
                i = recover(lt) if end < 0 else end + 1
            continue
        if nxt == "?":
            end = find(">", lt + 2)
            i = recover(lt) if end < 0 else end + 1
            continue
        if nxt == "/":
            if lt + 2 < n and _is_ascii_alpha(html[lt + 2]):
                # fast path for the overwhelmingly common '</name>' /
                # '</name >' shape — no regex: strict endtagfind name
                # charset, optional whitespace, '>'
                k = lt + 2
                while k < n and (html[k].isalnum()
                                 or html[k] in "-.:_"):
                    k += 1
                e2 = k
                while e2 < n and html[e2] in " \t\n\r\f":
                    e2 += 1
                if e2 < n and html[e2] == ">":
                    i = e2 + 1
                    if skip_tag is not None:   # name only matters
                        end_tag(html[lt + 2:k].lower())
                    continue
                # tolerant path: wide name charset, then the first
                # '>' AFTER the name (NOT quote-aware — parse_endtag
                # never honours quotes)
                k = lt + 2
                while k < n and html[k] not in _TAGNAME_STOP:
                    k += 1
                end = find(">", k)
                if end < 0:
                    i = recover(lt)
                    continue
                i = end + 1
                if skip_tag is not None:
                    end_tag(html[lt + 2:k].lower())
                continue
            m = _ENDTAGFIND.match(html, lt)
            if m:                      # '</ name >' with leading space
                i = m.end()
                if skip_tag is not None:
                    end_tag(m.group(1).lower())
                continue
            # '</' + non-letter → bogus comment until '>' (dropped)
            end = find(">", lt + 2)
            i = recover(lt) if end < 0 else end + 1
            continue
        if _is_ascii_alpha(nxt):
            k = lt + 1
            while k < n and html[k] not in _TAGNAME_STOP:
                k += 1
            tagname = html[lt + 1:k].lower()
            end = _tag_end(html, k)    # quote-aware, like parse_starttag
            if end < 0:
                i = recover(lt)
                continue
            self_closing = html[end - 1] == "/"
            i = end + 1
            if self_closing:
                continue               # handle_startendtag: no-op
            # handle_starttag bookkeeping
            if skip_tag is not None:
                if tagname == skip_tag:
                    depth += 1
            elif tagname in SKIP_CONTENT_ELEMENTS:
                skip_tag = tagname
                depth = 1
            if tagname in _CDATA_ELEMENTS:
                # raw-text mode: everything to the FULL '</ name >'
                # end tag is data; that end tag then fires
                # handle_endtag like any other
                m = _cdata_close_re(tagname).search(html, i)
                if not m:
                    i = n
                    continue
                i = m.end()
                end_tag(tagname)
            continue
        # '<' followed by anything else is literal text
        if skip_tag is None:
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
