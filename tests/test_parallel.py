"""fan_out: the planning-time parallelism guard for CPU-dense stages.

Contract (gear5_spark/parallel.py): a narrow input (fewer partitions
than the session's default parallelism) is round-robin repartitioned to
full width; an already-wide input is returned UNTOUCHED (no extra
shuffle at corpus scale); a streaming frame is always untouched (no
.rdd on streaming plans). Values must never change — fan_out is pure
data movement.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gear5_spark.parallel import fan_out


def test_narrow_input_spreads_to_default_parallelism(spark):
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(100)], "doc_id long, text string"
    ).coalesce(1)
    assert df.rdd.getNumPartitions() == 1
    out = fan_out(df)
    assert (
        out.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    # pure movement: same rows, nothing dropped or duplicated
    assert sorted(r.doc_id for r in out.collect()) == list(range(100))


def test_wide_input_is_untouched(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(target + 3)
    out = fan_out(df)
    # identical plan object — no repartition was inserted
    assert out is df


def test_streaming_frame_is_untouched(spark, tmp_path):
    path = str(tmp_path / "in")
    spark.range(10).write.parquet(path)
    stream = spark.readStream.schema("id long").parquet(path)
    out = fan_out(stream)
    assert out is stream
    assert out.isStreaming


def test_values_bit_stable_through_fan_out(spark):
    """The signature math downstream must see identical values whether
    or not the guard fired — fan_out must not reorder WITHIN a row or
    alter types."""
    df = spark.createDataFrame(
        [(i, [float(i), i / 3.0]) for i in range(50)],
        "vec_id long, embedding array<double>",
    ).coalesce(1)
    before = {r.vec_id: r.embedding for r in df.collect()}
    after = {r.vec_id: r.embedding for r in fan_out(df).collect()}
    assert before == after


def test_shuffle_bearing_plan_is_untouched(spark):
    """A plan that already contains exchanges (join/aggregate/window)
    must be returned as-is: probing .rdd there would EXECUTE the
    upstream stages under AQE just to count partitions, and such plans
    already carry shuffle-partition width."""
    a = spark.createDataFrame(
        [(i, i % 7) for i in range(100)], "id long, k long"
    ).coalesce(1)
    agg = a.groupBy("k").agg(F.count(F.lit(1)).alias("c"))
    assert fan_out(agg) is agg
    joined = a.join(a.withColumnRenamed("id", "id2"), "k")
    assert fan_out(joined) is joined
    # a narrow projection/filter over a scan still qualifies
    narrow = a.filter(F.col("id") > 3).select("id")
    assert fan_out(narrow) is not narrow
