"""HTML main-content extraction via text-density heuristics.

The north rule names "HTML boilerplate stripping via DOM-tree
text-density heuristics" as part of main-content extraction; the
reference service has no HTML path (SURVEY.md §7.1 step 9), so these
semantics are defined by this kernel and mirrored by the oracle.

Classic block-level density heuristic (in the spirit of the published
Boilerpipe / CETD line of work): split the document into blocks at
block-level tags, score each block by

- ``text_density``  = visible chars / raw chars (markup-heavy blocks
  like nav bars score low),
- ``link_density``  = chars inside <a> / visible chars (link lists
  score high),

and keep blocks that look like body text.  Deterministic, stdlib-only
(regex), vectorizable per batch by calling once per span.
"""

from __future__ import annotations

import re

_SCRIPT_RE = re.compile(r"<(script|style|noscript)\b.*?</\1\s*>", re.S | re.I)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_BLOCK_SPLIT_RE = re.compile(
    r"</?(?:div|p|h[1-6]|li|ul|ol|table|tr|td|th|section|article|header|"
    r"footer|nav|aside|blockquote|pre|form|br|hr)\b[^>]*>",
    re.I,
)
_A_RE = re.compile(r"<a\b[^>]*>(.*?)</a\s*>", re.S | re.I)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")

MIN_TEXT_CHARS = 25
MAX_LINK_DENSITY = 0.4
MIN_TEXT_DENSITY = 0.5


def _visible(fragment: str) -> str:
    return _WS_RE.sub(" ", _TAG_RE.sub(" ", fragment)).strip()


def strip_boilerplate(html: str) -> str:
    """Extract main-content text; kept blocks joined with "\\n"."""
    cleaned = _COMMENT_RE.sub(" ", _SCRIPT_RE.sub(" ", html))
    kept: list[str] = []
    for block in _BLOCK_SPLIT_RE.split(cleaned):
        text = _visible(block)
        if len(text) < MIN_TEXT_CHARS:
            continue
        raw_len = len(block.strip()) or 1
        link_text = " ".join(_visible(m) for m in _A_RE.findall(block))
        link_density = len(link_text) / len(text)
        text_density = len(text) / raw_len
        if link_density <= MAX_LINK_DENSITY and text_density >= MIN_TEXT_DENSITY:
            kept.append(text)
    return "\n".join(kept)
