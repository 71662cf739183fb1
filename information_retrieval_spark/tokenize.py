"""Deterministic tokenizers, shared verbatim between engine and test oracle.

The reference tokenizes with spaCy lemmatization (`ui/backend/mir/search/
preprocess.py:23-39`); that is non-deterministic across model versions, so —
per SURVEY.md §1.4(3) — our engine replaces it with fixed pure-Python/regex
tokenizers. These functions ARE the tokenization spec: the Spark engine calls
them inside vectorized pandas UDFs (or reproduces them with built-in column
expressions, verified equivalent by tests), and `tests/oracle.py` calls them
directly, so engine == oracle at the text-processing layer by construction.

Two tokenizers:

* ``simple_tokens`` — lowercase, split on ``[^a-z0-9]+``. Exactly mirrorable
  in ANSI SQL / DuckDB (``string_split_regex(lower(text), '[^a-z0-9]+')``)
  and in Spark (``split(lower(text), '[^a-z0-9]+')``), used for the
  driver-verifiable `documents` corpus.
* ``code_tokens`` — code-aware: extracts identifier/number runs, splits
  snake_case and camelCase, lowercases, and keeps the **character offset** of
  every emitted subtoken (the reference's "position = char offset"
  convention, `ui/backend/mir/search/token.py:11-13`, quirk Q4).
"""

from __future__ import annotations

import re

# Mirrors DuckDB string_split_regex / Spark split semantics (empties dropped
# by callers on both sides).
SIMPLE_SPLIT_PATTERN = r"[^a-z0-9]+"
_SIMPLE_SPLIT_RE = re.compile(SIMPLE_SPLIT_PATTERN)

# Identifier-ish runs in source code: letters/underscores then word chars, or
# bare digit runs. Operators/punctuation are dropped (reference drops
# punctuation tokens, `preprocess.py:38`).
_WORD_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*|[0-9]+")

# camelCase hump boundaries: lower→Upper, or ACRONYMWord (e.g. "HTTPServer"
# → "HTTP", "Server").
_CAMEL_RE = re.compile(r"[A-Z]+(?![a-z])|[A-Z][a-z0-9]*|[a-z0-9]+")


def simple_tokens(text: str) -> list[str]:
    """Lowercase and split on non-[a-z0-9]; drop empty strings."""
    if not text:
        return []
    return [t for t in _SIMPLE_SPLIT_RE.split(text.lower()) if t]


def code_tokens(text: str) -> list[tuple[str, int]]:
    """Code-aware tokenize with char offsets.

    Returns ``[(term, char_offset), ...]`` in document order. snake_case and
    camelCase identifiers are split into lowercase subtokens, each carrying
    the offset of its own first character; pure digit runs are kept as-is.
    """
    if not text:
        return []
    out: list[tuple[str, int]] = []
    for m in _WORD_RE.finditer(text):
        word = m.group(0)
        base = m.start()
        # split snake_case on underscores, keeping sub-offsets
        pos = 0
        for part in word.split("_"):
            if part:
                for cm in _CAMEL_RE.finditer(part):
                    out.append((cm.group(0).lower(), base + pos + cm.start()))
            pos += len(part) + 1
    return out


def code_terms(text: str) -> list[str]:
    """Terms only (document order), for callers that don't need offsets."""
    return [t for t, _ in code_tokens(text)]
