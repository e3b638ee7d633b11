"""Deterministic HTML → text extraction (trafilatura-style, engine-defined).

The reference has no extractor (SURVEY.md: the north rule ADDS text
extraction around the reference's disambiguation core), so this function IS
the defining oracle: the north rule's per-row invariant is that the pipeline
emits byte-identical text per url across runs and parallelism levels, which
holds because extraction is a pure function of the html bytes.

Semantics (documented, tested):
1. decode utf-8 (errors="replace");
2. drop comments and <script>/<style>/<noscript>/<template> element bodies;
3. drop boilerplate containers <nav>/<header>/<footer>/<aside>/<form>
   (non-nested occurrences — our corpus generator never nests same-name
   boilerplate containers; a general-web deployment would swap in an
   HTML5-tree extractor behind the same signature);
4. block-level tags (<p>, <div>, <h1-6>, <li>, <tr>, <br>, <title>, ...)
   become newlines; all other tags are stripped;
5. HTML entities unescaped;
6. per line: collapse internal whitespace to single spaces, strip; drop
   empty lines; join with "\n".

All regexes are precompiled at module import — `map_batches` workers pay the
compile cost once per process.
"""
from __future__ import annotations

import html as _html
import re

_RE_DROP = re.compile(
    r"<!--.*?-->"
    r"|<\s*(script|style|noscript|template)\b.*?<\s*/\s*\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_RE_BOILER = re.compile(
    r"<\s*(nav|header|footer|aside|form)\b.*?<\s*/\s*\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_RE_BLOCK = re.compile(
    r"<\s*/?\s*(p|div|h[1-6]|li|ul|ol|tr|table|br|title|section|article|"
    r"blockquote|pre|dt|dd)\b[^>]*>",
    re.IGNORECASE,
)
_RE_TAG = re.compile(r"<[^>]+>")
_RE_SPACES = re.compile(r"[ \t\r\f\v ]+")


def extract_text(html_bytes: bytes | str) -> str:
    """Pure function: html bytes → extracted text (byte-stable)."""
    if isinstance(html_bytes, bytes):
        doc = html_bytes.decode("utf-8", errors="replace")
    else:
        doc = html_bytes
    doc = _RE_DROP.sub(" ", doc)
    doc = _RE_BOILER.sub(" ", doc)
    doc = _RE_BLOCK.sub("\n", doc)
    doc = _RE_TAG.sub(" ", doc)
    doc = _html.unescape(doc)
    lines = []
    for line in doc.split("\n"):
        line = _RE_SPACES.sub(" ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)
