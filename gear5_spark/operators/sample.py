"""Deterministic hash-based sampling for training-data pipelines.

A row is kept iff the first 15 hex chars of ``md5(salt|key)`` — a uniform
60-bit draw in hex — sort below the fraction's threshold string. The
decision is a pure function of (salt, key):

- reproducible across engines (the same rule is one line of ANSI-ish SQL,
  which is how the DuckDB oracle re-derives it exactly);
- stable under repartitioning and retries, unlike ``DataFrame.sample``
  whose Bernoulli draw depends on partition layout — at 100 TB a task
  retry must not change the sample;
- composable: the same key drawn at two fractions f1 < f2 yields nested
  samples (the f1 sample is a subset of the f2 sample), which is what
  ablation ladders need.

Per-stratum fractions (``stratified_sample``) give deterministic domain
mixing: weight web 10%, code 100%, forums 30% — the standard pretraining
mix knob. Everything is JVM-side ``md5``/``substring``; one scan, zero
shuffles, and the filter is a plain predicate so Catalyst applies it
before wide transforms.

The reference has no sampling operator (its only sample is the fixed
100-record discover probe, ``/root/reference/protocol/discover.go:46``);
this is a scale-path addition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BITS = 60  # 15 hex chars
_HEX_CHARS = 15


def threshold_hex(fraction: float) -> str:
    """Threshold string for ``draw < threshold`` keep decisions.

    fraction <= 0 -> no draw qualifies; fraction >= 1 -> ``"g"`` (sorts
    above every hex string, keeps everything); else the 15-hex-char
    floor(fraction * 2^60) boundary."""
    if fraction <= 0.0:
        return "0" * _HEX_CHARS
    if fraction >= 1.0:
        return "g"
    return format(int(fraction * (1 << _BITS)), f"0{_HEX_CHARS}x")


def hash_draw(key_cols: list[str | Column], salt: str = "gear5") -> Column:
    """The 60-bit uniform draw as a 15-char lowercase-hex column.

    Key parts are escaped (backslash doubled, ``|`` -> ``\\|``) before
    the ``|`` join, so delimiter injection cannot collide distinct keys
    (``('a|b','c')`` vs ``('a','b|c')``); a NULL part becomes a lone
    backslash — a string no escaped value can produce — so
    ``('a', NULL)``, ``(NULL, 'a')`` and ``('a',)`` all draw
    independently. For keys without ``|`` or backslash characters (ids,
    enum strata — the normal case) the drawn string is exactly
    ``salt|k1|k2|...``, which is what the SQL oracles recompute."""
    cols = [
        F.coalesce(
            F.replace(
                F.replace(
                    (F.col(c) if isinstance(c, str) else c).cast("string"),
                    F.lit("\\"),
                    F.lit("\\\\"),
                ),
                F.lit("|"),
                F.lit("\\|"),
            ),
            F.lit("\\"),
        )
        for c in key_cols
    ]
    return F.substring(
        F.md5(F.concat_ws("|", F.lit(salt), *cols)), 1, _HEX_CHARS
    )


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_cols: list[str],
    salt: str = "gear5",
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided per row by the key hash."""
    return df.filter(hash_draw(key_cols, salt) < F.lit(threshold_hex(fraction)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_cols: list[str],
    salt: str = "gear5",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum sampling fractions (domain mixing): rows whose
    ``strata_col`` value is missing from ``fractions`` are sampled at
    ``default_fraction`` (default: dropped)."""
    thresh: Column = F.lit(threshold_hex(default_fraction))
    for value, fraction in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col) == value, F.lit(threshold_hex(fraction))
        ).otherwise(thresh)
    return df.filter(hash_draw(key_cols, salt) < thresh)
