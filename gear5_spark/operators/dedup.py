"""Latest-event-per-key reduction (micro-batch CDC dedup).

The reference applies WAL changes strictly one-at-a-time in LSN order
(``/root/reference/pkg/waljs/waljs.go:332-348`` serial OnMessage loop), so
"last write wins per key" is implicit (SURVEY.md A5). A distributed
micro-batch sees many events per key at once, so the reduction must be
explicit and deterministically ordered by ``(lsn, txn_seq)``.

Two physical strategies, both shuffle-once on the key:

- ``max_by`` aggregation (default): ``groupBy(key).agg(max_by(payload,
  struct(lsn, txn_seq)))``. Catalyst plans this with a *partial aggregate
  before the shuffle* (map-side combine), so a hot key's events collapse
  within each input partition first — at 100 TB this is the difference
  between shuffling every event of a hot conv_id to one reducer and
  shuffling one pre-reduced row per input partition.
- salted two-phase (``salt_buckets > 1``): an explicit
  ``groupBy(key, salt) -> groupBy(key)`` cascade for pathological skew
  where even partial aggregation leaves reducers unbalanced (SURVEY.md
  §4 skew row). Salt = ``pmod(xxhash64(lsn), S)`` — deterministic, no RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ORDER_COLS = ("lsn", "txn_seq")


def latest_per_key(
    df: DataFrame,
    key_cols: list[str],
    order_cols: tuple[str, ...] = ORDER_COLS,
    salt_buckets: int = 1,
    co_group_cols: list[str] | None = None,
) -> DataFrame:
    """Reduce a change-event DataFrame to the single latest event per key.

    Output columns == input columns (latest event's values win wholesale).
    Ties are impossible by construction — (lsn, txn_seq) is unique per
    event (FIXTURES.md §2) — but the struct ordering is total regardless.

    ``co_group_cols``: columns FUNCTIONALLY DEPENDENT on the key (e.g. a
    bucket/placement slot derived from it) added to the groupBy. Groups
    are unchanged; the point is physical: when the input is already
    hash-partitioned on one of these columns, Catalyst elides the
    aggregation exchange entirely — dedup runs shuffle-free inside the
    partitioning an upstream repartition chose (see
    ``LakeTable.placement_expr``). Mutually exclusive with salting
    (a salted co-located plan would reintroduce the shuffle anyway).
    """
    co_group_cols = co_group_cols or []
    if co_group_cols and salt_buckets > 1:
        raise ValueError("co_group_cols and salt_buckets are exclusive")
    group_cols = [*co_group_cols, *key_cols]
    payload_cols = [c for c in df.columns if c not in group_cols]
    ord_expr = F.struct(*[F.col(c) for c in order_cols])
    payload = F.struct(*[F.col(c) for c in payload_cols])

    if salt_buckets > 1:
        salted = df.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(order_cols[0])), F.lit(salt_buckets))
        )
        stage1 = salted.groupBy(*key_cols, "_salt").agg(
            F.max_by(payload, ord_expr).alias("_p")
        )
        stage2 = stage1.groupBy(*key_cols).agg(
            F.max_by(
                F.col("_p"),
                F.struct(*[F.col(f"_p.{c}") for c in order_cols]),
            ).alias("_p")
        )
    else:
        stage2 = df.groupBy(*group_cols).agg(
            F.max_by(payload, ord_expr).alias("_p")
        )

    return stage2.select(
        *group_cols, *[F.col(f"_p.{c}").alias(c) for c in payload_cols]
    ).select(*df.columns)
