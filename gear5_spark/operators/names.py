"""Column-name sanitization (F9) for discovered payload keys.

Mirrors the reference's ``SafeNameConversion``
(``/root/reference/drivers/google-sheets/internal/utils.go:147-185``):
``'1MyName' -> '_1_my_name'`` — transliterate to ASCII (unidecode),
tokenize on case/digit/symbol boundaries, drop symbol runs in the middle,
guard a leading digit with ``_``, join with ``_``, lowercase. Payload JSON
keys pass through this before becoming schema-registry column names, so a
feed key like ``größe`` or ``1MyName`` can never produce an invalid or
collision-prone parquet field name.
"""

from __future__ import annotations

import re
import unicodedata

SEPARATOR = "_"

# the same token grammar as the reference's regex
# "[A-Z]+[a-z]*|[a-z]+|\d+|(?P<NoToken>[^a-zA-Z\d]+)" — a symbol run
# matches the NoToken group and becomes an empty token.
_TOKEN_RE = re.compile(r"[A-Z]+[a-z]*|[a-z]+|\d+|(?P<NoToken>[^a-zA-Z\d]+)")

# common Latin-script multi-char transliterations NFKD cannot produce
# (stand-in for the reference's unidecode dependency; covers the cases
# plain combining-mark stripping loses entirely)
_TRANSLIT = {
    "ß": "ss", "æ": "ae", "Æ": "AE", "ø": "o", "Ø": "O",
    "œ": "oe", "Œ": "OE", "đ": "d", "Đ": "D", "þ": "th", "Þ": "TH",
    "ð": "d", "Ð": "D", "ł": "l", "Ł": "L",
}


def _unidecode(text: str) -> str:
    out = []
    for ch in text:
        if ch in _TRANSLIT:
            out.append(_TRANSLIT[ch])
            continue
        decomposed = unicodedata.normalize("NFKD", ch)
        ascii_part = decomposed.encode("ascii", "ignore").decode("ascii")
        out.append(ascii_part)
    return "".join(out)


def sanitize_name(text: str) -> str:
    """``SafeNameConversion`` semantics (utils.go:154-184)."""
    text = _unidecode(text)
    tokens: list[str] = []
    for m in _TOKEN_RE.finditer(text):
        tokens.append("" if m.group("NoToken") else m.group(0))
    # drop empty (symbol-run) tokens in the middle; first/last kept so a
    # leading/trailing symbol still yields a leading/trailing separator
    if len(tokens) >= 3:
        tokens = [tokens[0]] + [t for t in tokens[1:-1] if t] + [tokens[-1]]
    # leading-digit guard: '1MyName' -> '_1_my_name'
    if tokens and tokens[0].isdigit():
        tokens = [""] + tokens
    return SEPARATOR.join(tokens).lower()


def sanitize_unique(
    names: list[str], taken: set[str] | None = None
) -> dict[str, str]:
    """Map raw payload keys -> sanitized column names, deduplicating
    collisions deterministically (``a-b`` and ``a_b`` both sanitize to
    ``a_b``; the second, in sorted raw-key order, becomes ``a_b_2``).
    ``taken`` reserves names already in use (existing registry columns,
    key columns)."""
    out: dict[str, str] = {}
    used: set[str] = set(taken or ())
    for raw in sorted(names):
        base = sanitize_name(raw) or "_"
        name = base
        suffix = 2
        while name in used:
            name = f"{base}_{suffix}"
            suffix += 1
        out[raw] = name
        used.add(name)
    return out
