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


# Single-pass equivalent of the (word → underscore-split → camel) cascade:
# every match IS a final subtoken at its true char offset. The lookbehind
# alternative reproduces the cascade's digit rule — digits MERGE into a
# following lowercase run only inside an identifier (preceded by a word
# char), while a digit run at a word boundary stands alone ("X3b" → x,3b
# but " 3b" → 3,b). Fuzz-tested equivalent to ``code_tokens`` (20k+ random
# strings, tests/test_tokenize.py); enables one C-level scan per Arrow
# batch in the index build instead of three nested per-row Python loops.
FLAT_CODE_RE = re.compile(
    r"[A-Z]+(?![a-z])|[A-Z][a-z0-9]*|[a-z][a-z0-9]*"
    r"|(?<=[A-Za-z0-9_])[0-9][a-z0-9]*|[0-9]+"
)


def code_tokens_bulk(texts: list[str]) -> tuple[list[str], "object", "object"]:
    """Vectorized ``code_tokens`` over many texts at once.

    Joins the batch with ``\\x00`` (never inside a token), runs ONE
    ``finditer`` over the mega-string, and maps global match offsets back
    to (row, in-row offset) with a numpy searchsorted — the per-token
    Python cost is a single ``.lower()``.

    Returns ``(terms, row_idx ndarray, offset ndarray)``.
    """
    import numpy as np

    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    bounds = np.zeros(len(texts), dtype=np.int64)
    if len(texts) > 1:
        np.cumsum(lens[:-1] + 1, out=bounds[1:])
    joined = "\x00".join(texts)
    terms: list[str] = []
    gstarts: list[int] = []
    for m in FLAT_CODE_RE.finditer(joined):
        terms.append(m.group(0).lower())
        gstarts.append(m.start())
    g = np.asarray(gstarts, dtype=np.int64)
    rows = np.searchsorted(bounds, g, side="right") - 1
    offs = g - bounds[rows]
    return terms, rows, offs
