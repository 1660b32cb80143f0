"""Payload type inference from sampled JSON values.

Parity with the reference's per-value inference
(``/root/reference/typeutils/datatype.go:12-40``): bool -> BOOL, any int
width -> INT64, float -> FLOAT64, string -> TIMESTAMP if it date-parses
(``datatype.go:24-30``) else STRING, slice -> ARRAY, map -> OBJECT; the
merged type of mixed samples walks the widening lattice
(``typeutils/fields.go:18-28``: BOOL < INT64 < FLOAT64 < STRING, string
is the top). Beyond parity, ARRAY/OBJECT get a *concrete* Spark element/
field type (the reference keeps them opaque) so they land as real
``array<...>``/``struct<...>`` columns instead of strings.

Types travel as string **tokens** in the schema registry:

- ``string | boolean | long | double`` — scalars, parsed as string then
  coerced columnar-ly (reference ReformatValue semantics: "yes" -> true,
  "3.9" -> 3 — operators/normalize.py);
- ``timestamp_iso``  — date-parseable strings -> multi-layout parse;
- ``epoch_seconds``  — numeric epoch -> ``timestamp_seconds`` (the base
  ``ts`` field; never inferred, reference types numbers INT64/FLOAT64);
- any Spark DDL (``array<long>``, ``struct<a:string>``) — parsed typed.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

SCALAR_TOKENS = ("boolean", "long", "double", "string", "timestamp_iso",
                 "epoch_seconds")

# widening order for inferred scalar tokens; merging anything with
# string (or two different complex types) yields string — the lattice top
_RANK = {"boolean": 0, "long": 1, "double": 2, "string": 3}

# the reference tries 11 layouts (typeutils/reformat.go:16-28); these are
# the Python-side equivalents of the ones coerce_timestamp() parses, so a
# key inferred timestamp_iso is guaranteed to parse JVM-side.
_DATE_FORMATS = [
    "%Y-%m-%dT%H:%M:%S.%f%z",
    "%Y-%m-%dT%H:%M:%S%z",
    "%Y-%m-%dT%H:%M:%S.%f",
    "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%d %H:%M:%S.%f",
    "%Y-%m-%d %H:%M:%S",
    "%Y/%m/%d %H:%M:%S",
    "%Y-%m-%d",
    "%Y/%m/%d",
    "%m/%d/%Y",
    "%d %b %Y %H:%M:%S",
]

_IDENT_OK = __import__("re").compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def is_date_string(s: str) -> bool:
    """datatype.go:24-30 — any string ReformatDate accepts is TIMESTAMP."""
    if not s or len(s) < 6 or len(s) > 40:
        return False
    for fmt in _DATE_FORMATS:
        try:
            dt.datetime.strptime(s, fmt)
            return True
        except ValueError:
            continue
    return False


def merge_tokens(a: str | None, b: str | None) -> str:
    """Lattice LCA of two scalar/complex tokens (fields.go:182-205)."""
    if a is None:
        return b if b is not None else "string"
    if b is None:
        return a
    if a == b:
        return a
    if a in _RANK and b in _RANK:
        return a if _RANK[a] > _RANK[b] else b
    if a == "timestamp_iso" or b == "timestamp_iso":
        # timestamp + anything-else -> string (string is the only
        # ancestor of TIMESTAMP in the reference tree)
        other = b if a == "timestamp_iso" else a
        return "string" if other != "timestamp_iso" else "timestamp_iso"
    return "string"  # mixed complex/scalar families -> top


def _scalar_token(v) -> str:
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "long"
    if isinstance(v, float):
        return "double"
    if isinstance(v, str):
        return "timestamp_iso" if is_date_string(v) else "string"
    return "string"


def _spark_type(values: list, depth: int) -> T.DataType:
    """Concrete Spark type for nested positions (inside arrays/objects);
    timestamps inside nested values stay strings (no coercion chain runs
    inside a from_json subtree)."""
    tok: str | None = None
    has_list = any(isinstance(v, list) for v in values)
    has_dict = any(isinstance(v, dict) for v in values)
    if has_list and not has_dict and all(
        isinstance(v, list) for v in values if v is not None
    ):
        if depth <= 0:
            return T.StringType()
        elems = [e for v in values for e in v if e is not None]
        return T.ArrayType(
            _spark_type(elems, depth - 1) if elems else T.StringType()
        )
    if has_dict and not has_list and all(
        isinstance(v, dict) for v in values if v is not None
    ):
        if depth <= 0:
            return T.StringType()
        keys = sorted({k for v in values for k in v})
        if not keys or not all(_IDENT_OK.match(k) for k in keys):
            return T.StringType()  # exotic nested keys -> opaque JSON text
        return T.StructType(
            [
                T.StructField(
                    k,
                    _spark_type(
                        [v[k] for v in values if k in v and v[k] is not None],
                        depth - 1,
                    ),
                    True,
                )
                for k in keys
            ]
        )
    if has_list or has_dict:
        return T.StringType()  # mixed scalar/complex
    for v in values:
        s = _scalar_token(v)
        s = "string" if s == "timestamp_iso" else s
        tok = merge_tokens(tok, s)
    return {
        "boolean": T.BooleanType(),
        "long": T.LongType(),
        "double": T.DoubleType(),
    }.get(tok or "string", T.StringType())


def infer_token(values: list, max_depth: int = 3) -> str:
    """Registry type token for a newly discovered payload key, from up to
    100 sampled non-null values (protocol/discover.go:46-90 samples 100
    records per stream; we sample per key per micro-batch)."""
    values = [v for v in values if v is not None]
    if not values:
        return "string"
    if any(isinstance(v, (list, dict)) for v in values):
        spark_t = _spark_type(values, max_depth)
        return spark_t.simpleString()
    tok: str | None = None
    for v in values:
        tok = merge_tokens(tok, _scalar_token(v))
    return tok or "string"
