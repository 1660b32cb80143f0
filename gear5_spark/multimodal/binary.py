"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata struct —
the lake layer treats them like any other column (bucketed parquet,
schema-evolved), and all per-byte work runs in Arrow-batched
``mapInPandas`` transforms so the bytes never materialize row-at-a-time
in Python object form.

The actual codecs (image decode, audio resample, video frame-sample) are
STUBBED: this container ships no Pillow/ffmpeg. ``decode_stub=True``
(default) substitutes a deterministic fake that preserves the real
pipeline shape — schema in/out, Arrow batch iteration, partition
behavior — so the plumbing is fully tested; flipping the stub out for a
real codec changes only the innermost function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synthesize_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (no external data): payload bytes
    are an ASCII string derived from sha256 hex digests, so an external
    SQL oracle can recompute content hashes/sizes
    (``sha256('<seed>:<i>:' || repeat(sha256('<seed>:<i>'), 4+i%13))``).
    Real deployments swap this for actual image/audio bytes; everything
    downstream treats the column as opaque binary either way."""
    kinds = ["image", "audio", "video"]
    mimes = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        hexd = hashlib.sha256(f"{seed}:{i}".encode()).hexdigest()
        blob = (f"{seed}:{i}:" + hexd * (4 + i % 13)).encode("ascii")
        meta = (
            (64 + i % 32, 64 + i % 24, None)
            if kind == "image"
            else (None, None, 1000 + (i * 37) % 9000)
        )
        rows.append((i, kind, mimes[kind], bytearray(blob), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_real(payload: bytes, kind: str) -> list[float]:  # pragma: no cover
    """Real codec hook — not available in this container."""
    raise NotImplementedError(
        "media codecs (Pillow/librosa/ffmpeg) are not installed; "
        "run with decode_stub=True or install codecs on the cluster"
    )


def _decode_stub(payload: bytes, kind: str, dim: int) -> list[float]:
    """Deterministic fake feature: bytes of sha256 rounds, scaled to
    [0,1) — stable across runs/executors, shaped like a real embedding."""
    out: list[float] = []
    h = hashlib.sha256(payload + kind.encode())
    while len(out) < dim:
        d = h.digest()
        out.extend(b / 255.0 for b in d)
        h = hashlib.sha256(d)
    return out[:dim]


def extract_features(
    media: DataFrame, dim: int = 16, decode_stub: bool = True
) -> DataFrame:
    """Decode + featurize every payload in Arrow batches (mapInPandas).

    At scale this is the canonical GPU/CPU-heavy stage: a narrow input
    is fanned out first so Arrow batches spread across executors instead
    of serializing on a one-split scan (no-op when splits ≥ cores); the
    binary column rides Arrow buffers end-to-end."""
    from gear5_spark.parallel import fan_out

    media = fan_out(media)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, hashes, sizes = [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                if payload is None:
                    # a MISSING payload is not an empty one: hashing it
                    # as b"" would make payload-less media collide with
                    # genuinely zero-byte media (and with each other)
                    sizes.append(None)
                    hashes.append(None)
                    feats.append(None)
                    continue
                b = bytes(payload)
                sizes.append(len(b))
                hashes.append(hashlib.sha256(b).hexdigest())
                if decode_stub:
                    feats.append(_decode_stub(b, kind, dim))
                else:
                    feats.append(_decode_real(b, kind))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.array(sizes, dtype="Int32"),
                    "sha256": hashes,
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def dedupe_media(media: DataFrame) -> DataFrame:
    """Exact media dedup on content hash — JVM-side sha2 over the binary
    column, one hash-shuffle (no Python)."""
    return (
        media.groupBy(F.sha2(F.col("payload"), 256).alias("content_sha256"))
        .agg(
            F.min("media_id").alias("keep_media_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )
