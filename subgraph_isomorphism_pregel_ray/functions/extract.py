"""Deterministic HTML → (text, hrefs) extraction and url normalization.

This is the webtext analogue of the reference's line parser
(``pregel_app_subgraph.h:689-714`` — ``<vID> <label> <nbr> <nbrLabel>…`` →
vertex + adjacency): one pure function that turns a raw page into a vertex
(its text) plus its out-edges (hrefs). The contract from
``BASELINE.json.input_hint`` is *byte-identical extracted text per url*:
the same scalar function is used by the synthetic-pages generator (to write
the expected ``text`` column), by the pipeline `map_batches` stage, and by the
test oracles — so identity holds by construction and is asserted in tests.

Rules (fixed; changing any of them breaks stored fixtures):

1. drop ``<script>``/``<style>`` elements including their content and
   ``<!-- … -->`` comments;
2. every remaining tag is replaced by a single space;
3. HTML entities are decoded with :func:`html.unescape`;
4. whitespace runs (including newlines/tabs produced by steps 1-3) collapse
   to one ASCII space; leading/trailing whitespace is stripped.

Hrefs are taken from ``<a … href=…>`` attributes in document order,
entity-decoded, before any other transformation.

All functions are pure and stateless; the compiled regexes are module-level
(compiled once per worker process, not per batch).
"""

from __future__ import annotations

import html as _html
import re

__all__ = [
    "extract_text",
    "extract_hrefs",
    "extract_links",
    "normalize_url",
]

# Compiled once per process (actor/worker init cost, not per-batch cost).
_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")
_HREF_RE = re.compile(
    r"""<a\s[^>]*?href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>"']+))""",
    re.IGNORECASE | re.DOTALL,
)


def _as_str(html_doc) -> str:
    if isinstance(html_doc, (bytes, bytearray, memoryview)):
        return bytes(html_doc).decode("utf-8", errors="replace")
    return html_doc


def extract_text(html_doc) -> str:
    """Extract visible text from an HTML document (bytes or str) — pure."""
    s = _as_str(html_doc)
    s = _COMMENT_RE.sub(" ", s)
    s = _SCRIPT_STYLE_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _html.unescape(s)
    s = _WS_RE.sub(" ", s)
    return s.strip()


def extract_hrefs(html_doc) -> list[str]:
    """All ``<a href=…>`` targets in document order, entity-decoded."""
    s = _as_str(html_doc)
    out = []
    for m in _HREF_RE.finditer(s):
        href = m.group(1) or m.group(2) or m.group(3) or ""
        href = _html.unescape(href).strip()
        if href:
            out.append(href)
    return out


_LINK_RE = re.compile(
    r"""<a\s[^>]*?href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>"']+))[^>]*>(.*?)</a\s*>""",
    re.IGNORECASE | re.DOTALL,
)


def extract_links(html_doc) -> list[tuple[str, str]]:
    """All ``<a href=…>inner</a>`` pairs in document order →
    [(href, anchor_text)]. The href is entity-decoded like
    :func:`extract_hrefs`; the anchor text is the inner HTML run through
    the SAME text rules as :func:`extract_text` (tags → space, entities
    decoded, whitespace collapsed) so anchors are directly comparable to
    page text. Unclosed anchors contribute no pair (href-only links are
    :func:`extract_hrefs`'s job)."""
    s = _as_str(html_doc)
    out = []
    for m in _LINK_RE.finditer(s):
        href = m.group(1) or m.group(2) or m.group(3) or ""
        href = _html.unescape(href).strip()
        if not href:
            continue
        inner = _TAG_RE.sub(" ", m.group(4))
        inner = _WS_RE.sub(" ", _html.unescape(inner)).strip()
        out.append((href, inner))
    return out


_SCHEME_HOST_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.-]*://)([^/?#]*)(.*)$")


def host_of(url: str) -> str:
    """Lowercased host of an absolute URL (the cc-webgraph host-graph
    vertex identity, public Common Crawl tooling); '' for scheme-relative
    or relative hrefs — callers resolve those against the linking page."""
    m = _SCHEME_HOST_RE.match(url.strip())
    return m.group(2).lower() if m else ""


def normalize_url(url: str) -> str:
    """Canonical url for vertex identity: lowercase scheme+host, strip the
    fragment, strip a single trailing slash from a non-root path."""
    url = url.strip()
    frag = url.find("#")
    if frag != -1:
        # re-strip: dropping the fragment can expose trailing unicode
        # whitespace ('x\x85#y' → 'x\x85'), which would break idempotence
        url = url[:frag].strip()
    m = _SCHEME_HOST_RE.match(url)
    if m:
        url = m.group(1).lower() + m.group(2).lower() + m.group(3)
    if url.endswith("/") and url.count("/") > 3:
        url = url[:-1]
    return url
