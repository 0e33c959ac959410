"""Deterministic HTML → text extraction (the per-row byte-identical invariant).

The north-rule input is a Common-Crawl-style page table (url, warc_ts,
html:binary, text, lang); the reference's analogous doc→text slot is
prepare_for_entity_extraction's ``f"{title}\n\n{content}"``
(/root/reference/src/workspace_kg/utils/vespa_integration.py:1003-1020).

``extract_text`` is a single pure function with pinned normalization rules —
no locale, wall-clock, or environment dependence — so the same html bytes
always produce the same text bytes on every worker, process, and parallelism
level.  Tests assert byte-identity per url against committed goldens.

Rules (applied in order, all via compiled regexes over the decoded string):
  1. decode utf-8 (errors="replace")
  2. drop <script>/<style>/<noscript>/<template> elements and HTML comments
  3. block-level tags become "\n", all other tags become ""
  4. decode the five standard XML/HTML entities and numeric escapes
  5. collapse runs of spaces/tabs, strip each line, collapse 3+ newlines to 2
"""

from __future__ import annotations

import html as _htmllib
import re

_SCRIPTISH_RE = re.compile(
    r"<(script|style|noscript|template)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_BLOCK_TAG_RE = re.compile(
    r"</?(?:p|div|br|h[1-6]|li|ul|ol|tr|td|th|table|thead|tbody|section|article|"
    r"header|footer|nav|aside|main|blockquote|pre|figure|figcaption|form|title)\b[^>]*>",
    re.IGNORECASE,
)
_ANY_TAG_RE = re.compile(r"<[^>]+>")
_HSPACE_RE = re.compile(r"[ \t\r\f\v]+")
_MANY_NL_RE = re.compile(r"\n{3,}")


def extract_text(html: bytes | str) -> str:
    """Extract visible text from raw html bytes. Pure and deterministic."""
    if isinstance(html, bytes):
        s = html.decode("utf-8", errors="replace")
    else:
        s = html

    s = _COMMENT_RE.sub("", s)
    s = _SCRIPTISH_RE.sub("", s)
    s = _BLOCK_TAG_RE.sub("\n", s)
    s = _ANY_TAG_RE.sub("", s)
    s = _htmllib.unescape(s)

    s = _HSPACE_RE.sub(" ", s)
    lines = [ln.strip() for ln in s.split("\n")]
    s = "\n".join(lines)
    s = _MANY_NL_RE.sub("\n\n", s)
    return s.strip()


def prepared_text(title: str, content: str) -> str:
    """The reference's doc→text transform: title + blank line + content
    (vespa_integration.py:1013)."""
    return f"{title}\n\n{content}"
