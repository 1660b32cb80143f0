"""Document deduplication operators for large-scale training-data pipelines.

The reference has no text operators — these are the scale-path additions a
100 TB ingest engine needs (exact, MinHash+LSH, SimHash, n-gram Jaccard).
All are expressed over the ``documents`` table ``(doc_id, text, lang,
source, n_chars)``; everything stays JVM-side (built-in array/hash
functions) except where noted.

Scale notes:
- exact dedup: one shuffle on the fingerprint (groupBy), map-side combine.
- MinHash+LSH: shingles -> K minhashes via ``xxhash64(shingle, seed_k)``
  -> B bands of R rows -> candidate pairs join on (band, band_hash). The
  only joins are equi-joins on band buckets, never an O(n²) cross join.
- SimHash: 64-bit signature; near-dup candidates share a signature under
  bit-sampling bands (same LSH trick on 4×16-bit chunks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalized_text(col=None):
    return F.lower(F.trim(F.col("text") if col is None else col))


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Exact dedup: keep the min doc_id per normalized-text fingerprint;
    report group size. One hash-shuffle, partial-aggregated.

    NULL text means UNKNOWN content, never "duplicate of every other
    null": grouping would collapse unrelated docs under the NULL
    fingerprint and a keep-min consumer would delete them — null-text
    docs come back as their own singleton groups instead."""
    grouped = (
        docs.filter(F.col("text").isNotNull())
        .groupBy(F.md5(normalized_text()).alias("fingerprint"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )
    nulls = docs.filter(F.col("text").isNull()).select(
        F.lit(None).cast("string").alias("fingerprint"),
        F.col("doc_id").alias("keep_doc_id"),
        F.lit(1).cast("long").alias("dup_count"),
    )
    return grouped.unionByName(nulls).orderBy("keep_doc_id")


def shingles(col, n: int = 3):
    """Word n-gram shingle array (distinct), built with JVM array functions:
    tokens[i:i+n] joined — no Python in the loop."""
    tokens = F.split(normalized_text(col), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(tokens) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, n)),
        )
    )


def _shingle_hash(k: int, hasher: str, col=None):
    """Per-k shingle hash of column ``s`` (or an explicit expression —
    the row-wise path hashes inside an array lambda). ``xxhash64``
    (default, fastest JVM path) or ``md5``: first 16 hex chars of
    md5("{k}|{shingle}") as a STRING — lexicographic min over pure-ASCII
    hex is well-defined and bit-identical in any engine with md5, so the
    md5 family is the cross-engine-reproducible mode the DuckDB
    correctness oracle can recompute exactly."""
    col = F.col("s") if col is None else col
    if hasher == "xxhash64":
        return F.xxhash64(col, F.lit(k))
    if hasher == "md5":
        return F.substring(F.md5(F.concat(F.lit(f"{k}|"), col)), 1, 16)
    raise ValueError(f"unknown hasher {hasher!r}")


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 32,
    shingle_n: int = 3,
    hasher: str = "xxhash64",
) -> DataFrame:
    """K minhash values per doc: min over shingles of hash_k(shingle).

    The hash family is ``xxhash64(shingle, k)`` by default (fastest) or
    the md5-derived family (see :func:`_shingle_hash`) when a downstream
    consumer must reproduce the signatures outside Spark. All K mins
    are computed as independent min aggregates with map-side combine.
    A narrow input (fewer splits than cores) is fanned out first so the
    K×shingle hashing — the CPU-dense stage of the whole LSH pipeline —
    never serializes on the scan's partitioning (no-op at corpus scale,
    where splits outnumber cores; see :mod:`gear5_spark.parallel`)."""
    from gear5_spark.parallel import fan_out

    sh = fan_out(docs).select(
        "doc_id", F.explode(shingles(F.col("text"), shingle_n)).alias("s")
    )
    # explode + groupBy keeps codegen flat (K independent min aggregates
    # with map-side combine) instead of one enormous nested array lambda
    agg = sh.groupBy("doc_id").agg(
        *[
            F.min(_shingle_hash(k, hasher)).alias(f"mh_{k}")
            for k in range(num_hashes)
        ]
    )
    return agg.select(
        "doc_id",
        F.array(*[F.col(f"mh_{k}") for k in range(num_hashes)]).alias("minhash"),
    )


def minhash_signatures_rowwise(
    docs: DataFrame,
    num_hashes: int = 32,
    shingle_n: int = 3,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Stream-safe MinHash signatures: min over the shingle array per
    hash k as a PURE PROJECTION (``array_min`` over a ``transform``
    lambda) — no explode, no groupBy. Bit-identical to
    :func:`minhash_signatures` (tested), but legal on a STREAMING
    DataFrame, where the explode+groupBy plan would be a stateful
    aggregation. The batch default stays explode+groupBy because K
    independent min aggregates keep codegen flat; this variant trades
    one large nested expression for statelessness.

    NULL-text docs are dropped — the batch path drops them implicitly
    (explode of a NULL shingle array emits no rows); without this
    filter the row-wise path would emit all-NULL signatures whose band
    buckets collide with each other."""
    docs = docs.filter(F.col("text").isNotNull())
    sh = shingles(F.col("text"), shingle_n)

    def _hash_k(k: int):
        # a single-arg closure: F.transform inspects the lambda's arity
        # and a second parameter (even defaulted) would receive the
        # ELEMENT INDEX column, silently replacing k
        return lambda s: _shingle_hash(k, hasher, s)

    return docs.select(
        "doc_id",
        F.array(
            *[
                F.array_min(F.transform(sh, _hash_k(k))).alias(f"mh_{k}")
                for k in range(num_hashes)
            ]
        ).alias("minhash"),
    )


def _banded_pairs(
    banded: DataFrame, max_bucket_size: int, mark_star: bool = False
) -> DataFrame:
    """Candidate pairs from a (doc_id, band, bucket) assignment with the
    hot-bucket blowup bounded: buckets up to ``max_bucket_size`` emit
    all pairs (exact within-bucket recall); larger buckets degrade to
    *star* pairing — every member pairs with the bucket's min doc_id.
    A star is a spanning tree of the bucket, so connected-component
    dedup over the RAW candidate set loses nothing, while a degenerate
    bucket of n near-identical docs costs O(n) instead of O(n^2) pairs.
    CAVEAT: a downstream exact-confirm FILTER can break that guarantee —
    dropping a star's centre edge disconnects members that are mutually
    similar. Confirm-filtered pipelines must request ``mark_star=True``
    and exempt (or cluster-collapse) star edges; ``dedup_clusters`` does
    exactly this. ``lsh_bucket_stats`` reports which buckets degraded.

    ONE shuffle: the bucket groups once (collect_list) and pairs expand
    from the sorted id array with JVM array lambdas — a self-join would
    re-execute the (expensive) signature computation per side. A bucket
    materializes as one array per group; the pair OUTPUT is capped, and
    the array itself is linear in bucket size."""
    # pin the ONE bucket shuffle at an explicit width: an implicit
    # ENSURE_REQUIREMENTS exchange gets AQE-coalesced by BYTES, but a
    # bucket-group row is small while its explode fans into O(bucket²)
    # pairs — a few-KiB aggregate was observed collapsing the whole
    # pair expansion into one task. A user-specified hash repartition
    # on the grouping keys satisfies the aggregation's distribution
    # requirement (no second exchange is planned) and AQE honors its
    # count, so the explode runs at full width with no extra shuffle.
    # One group's explode is still atomic; the star cap bounds it at
    # O(bucket).
    from gear5_spark.parallel import shuffle_width

    spark = banded.sparkSession
    width = max(
        spark.sparkContext.defaultParallelism,
        shuffle_width(spark),
    )
    grouped = banded.repartition(width, "band", "bucket").groupBy(
        "band", "bucket"
    ).agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
    all_pairs = F.expr(
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids)), y -> struct(x AS a, y AS b))))"
    )
    star_pairs = F.expr(
        "transform(slice(ids, 2, size(ids)), "
        "y -> struct(element_at(ids, 1) AS a, y AS b))"
    )
    pairs = grouped.select(
        F.explode(
            F.when(F.size("ids") <= max_bucket_size, all_pairs).otherwise(
                star_pairs
            )
        ).alias("p"),
        (F.size("ids") > max_bucket_size).alias("_star"),
    )
    out = pairs.select(
        F.col("p.a").alias("doc_id_a"),
        F.col("p.b").alias("doc_id_b"),
        F.col("_star").alias("star"),
    )
    if mark_star:
        # a pair may arise from both a degraded and a normal bucket —
        # star=false (exhaustively generated somewhere) wins
        return out.groupBy("doc_id_a", "doc_id_b").agg(
            F.min(F.col("star").cast("int")).cast("boolean").alias("star")
        )
    return out.select("doc_id_a", "doc_id_b").distinct()


def lsh_near_duplicates(
    docs: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    max_bucket_size: int = 1000,
    hasher: str = "xxhash64",
    mark_star: bool = False,
) -> DataFrame:
    """MinHash-LSH candidate pairs: docs sharing any band bucket.

    rows-per-band R = num_hashes / bands; larger R = stricter. Returns
    (doc_id_a, doc_id_b) with a < b, distinct. The band join is an
    equi-join on (band_idx, band_hash) — shuffle is proportional to docs,
    never all-pairs — and buckets above ``max_bucket_size`` degrade to
    linear star pairing (see :func:`_banded_pairs`), so a pathological
    corpus of near-identical docs cannot trigger a quadratic blowup."""
    banded = lsh_band_buckets(docs, num_hashes, bands, shingle_n, hasher)
    return _banded_pairs(banded, max_bucket_size, mark_star)


def lsh_band_buckets(
    docs: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    hasher: str = "xxhash64",
) -> DataFrame:
    """(doc_id, band, bucket) LSH assignment — the shared prefix of pair
    generation and bucket diagnostics. In md5 mode the bucket is the
    band's signature values joined verbatim (a string) instead of a
    re-hash, so an external engine can rebuild the exact assignment."""
    sigs = minhash_signatures(docs, num_hashes, shingle_n, hasher)
    return band_assignments(sigs, num_hashes, bands, hasher)


def band_assignments(
    sigs: DataFrame, num_hashes: int, bands: int, hasher: str = "xxhash64"
) -> DataFrame:
    """(doc_id, band, bucket) from a (doc_id, minhash) signature frame —
    a pure projection + explode, shared by the batch path
    (:func:`lsh_band_buckets`) and the stream-safe row-wise path
    (:func:`minhash_signatures_rowwise`)."""
    if not 1 <= bands <= num_hashes or num_hashes % bands:
        # bands > num_hashes would silently hash ZERO rows per band
        # (every doc in one global bucket); a non-dividing band count
        # silently ignores the remainder hashes
        raise ValueError(
            f"bands must divide num_hashes (got bands={bands}, "
            f"num_hashes={num_hashes})"
        )
    r = num_hashes // bands

    def _bucket(b: int):
        joined = F.concat_ws(
            ",",
            *[
                F.element_at("minhash", b * r + i + 1).cast("string")
                for i in range(r)
            ],
        )
        # xxhash64 mode compresses the band to a long (cheaper shuffle
        # key); md5 mode keeps the raw join so it's reproducible outside
        return (
            F.xxhash64(joined) if hasher == "xxhash64" else joined
        ).alias("bucket")

    return sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), _bucket(b))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")


def lsh_bucket_stats(
    banded: DataFrame, max_bucket_size: int = 1000
) -> DataFrame:
    """Buckets that exceeded ``max_bucket_size`` (and thus degraded to
    star pairing), with sizes — surface this next to the pair output so
    caps are never silent."""
    return (
        banded.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .filter(F.col("bucket_size") > max_bucket_size)
    )


def _as_raw_index(index: DataFrame) -> DataFrame:
    """Normalize raw (doc_id) or compacted (corpus_doc_id) index rows to
    the (doc_id, band, bucket) shape so the two forms compose."""
    id_col = "corpus_doc_id" if "corpus_doc_id" in index.columns else "doc_id"
    return index.select(F.col(id_col).alias("doc_id"), "band", "bucket")


def compact_signature_index(index: DataFrame) -> DataFrame:
    """Collapse an LSH signature index to one witness row per
    (band, bucket): the min doc_id. This is the persistable form of the
    corpus index for membership-style incremental dedup — O(#buckets)
    rows regardless of corpus size, so a hot bucket of a million
    near-identical corpus docs stores (and joins) as ONE row. The min
    survives unions — ``compact(old ∪ delta) == compact(compact(old) ∪
    delta)`` — and this function accepts BOTH forms (raw
    ``lsh_band_buckets`` output or an already-compacted index), so
    increments never re-read the raw corpus; :func:`extend_signature_index`
    is the one-call absorb step."""
    return _as_raw_index(index).groupBy("band", "bucket").agg(
        F.min("doc_id").alias("corpus_doc_id")
    )


def extend_signature_index(index: DataFrame, delta: DataFrame) -> DataFrame:
    """Absorb an increment into a persisted index: union the existing
    index (raw or compacted) with the delta (``lsh_band_buckets`` of the
    kept new docs, or another index in either form) and recompact. The
    output is always the compacted O(#buckets) form — the steady-state
    loop is ``index = extend_signature_index(index,
    lsh_band_buckets(kept_new))`` with a parquet write per cycle."""
    return compact_signature_index(
        _as_raw_index(index).unionByName(_as_raw_index(delta))
    )


def incremental_lsh_duplicates(
    new_docs: DataFrame,
    index: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    hasher: str = "xxhash64",
    all_matches: bool = False,
) -> DataFrame:
    """Dedupe a NEW document batch against an already-indexed corpus
    without recomputing any corpus signature — the steady-state shape
    of crawl ingestion, where the corpus is ~100 TB and each increment
    is a sliver of it.

    ``index`` is a persisted ``lsh_band_buckets`` output for the corpus
    (``(doc_id, band, bucket)``, parquet, ideally partitioned by
    ``band``) or its :func:`compact_signature_index` form. Signatures
    are computed for ``new_docs`` ONLY; the corpus side is a pure
    columnar scan plus an equi-join on (band, bucket) — with a small
    increment, AQE broadcasts the new side, so the corpus never
    shuffles. After filtering, absorb the increment with
    :func:`extend_signature_index` over ``lsh_band_buckets`` of the kept
    new docs (within-batch pairs are :func:`lsh_near_duplicates` on the
    batch alone).

    Default output is one row per matched new doc: ``(doc_id,
    corpus_doc_id)`` where the witness is the MIN corpus doc_id sharing
    any band bucket (min of per-bucket minima == global min over all
    matching corpus docs, so the compacted index gives bit-identical
    answers to the raw one). ``all_matches=True`` returns every
    distinct (new, corpus) candidate pair instead — an audit mode that
    requires the raw index and inherits hot-bucket pair blowup, so keep
    it off the steady-state path."""
    newb = lsh_band_buckets(new_docs, num_hashes, bands, shingle_n, hasher)
    if all_matches:
        if "corpus_doc_id" in index.columns:
            raise ValueError(
                "all_matches needs the raw (doc_id, band, bucket) index; "
                "got a compacted one"
            )
        return (
            newb.join(
                index.select(
                    F.col("doc_id").alias("corpus_doc_id"), "band", "bucket"
                ),
                ["band", "bucket"],
            )
            .select("doc_id", "corpus_doc_id")
            .distinct()
        )
    reps = (
        index
        if "corpus_doc_id" in index.columns
        else compact_signature_index(index)
    )
    return (
        newb.join(reps, ["band", "bucket"])
        .groupBy("doc_id")
        .agg(F.min("corpus_doc_id").alias("corpus_doc_id"))
    )


def ngram_jaccard(
    docs: DataFrame,
    candidates: DataFrame | None = None,
    shingle_n: int = 3,
    threshold: float = 0.7,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs (default:
    LSH candidates — never all-pairs). ``array_intersect``/``array_union``
    on shingle arrays, JVM-side."""
    if candidates is None:
        # mark_star so hot-bucket connectivity edges survive the
        # jaccard confirm below (same contract as simhash/embedding
        # near-dup paths — see _banded_pairs star-cap note)
        candidates = lsh_near_duplicates(
            docs,
            shingle_n=shingle_n,
            max_bucket_size=max_bucket_size,
            mark_star=True,
        )
    from gear5_spark.parallel import fan_out

    sh = fan_out(docs).select(
        "doc_id", shingles(F.col("text"), shingle_n).alias("sh")
    )
    # spread the skinny candidate rows to full width before the
    # CPU-bound exact-Jaccard scoring: AQE's byte-based coalescing
    # packs millions of (id, id) pairs into a handful of tasks while
    # each row costs an array intersect+union downstream (see
    # sim.ann._confirm_cosine_pairs for the same hazard)
    candidates = candidates.repartition(
        docs.sparkSession.sparkContext.defaultParallelism
    )
    j = (
        candidates.join(
            sh.withColumnRenamed("doc_id", "doc_id_a").withColumnRenamed(
                "sh", "sh_a"
            ),
            "doc_id_a",
        )
        .join(
            sh.withColumnRenamed("doc_id", "doc_id_b").withColumnRenamed(
                "sh", "sh_b"
            ),
            "doc_id_b",
        )
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
    )
    # star edges from degraded hot buckets are CONNECTIVITY edges, not
    # similarity claims: filtering them by jaccard would disconnect
    # mutually-similar members of an over-budget bucket (see
    # _banded_pairs). They pass through when the candidate set marks
    # them — and the marker is KEPT in the output (same contract as
    # embedding_near_duplicates): without it a degraded bucket would
    # silently mix sub-threshold connectivity edges into the confirmed
    # pairs. Component consumers use all edges; per-pair similarity
    # consumers filter ~star.
    keep = F.col("jaccard") >= threshold
    out_cols = ["doc_id_a", "doc_id_b", F.round("jaccard", 6).alias("jaccard")]
    if "star" in candidates.columns:
        keep = keep | F.col("star")
        out_cols.append("star")
    return j.filter(keep).select(*out_cols)


def connected_components(
    edges: DataFrame,
    a_col: str = "doc_id_a",
    b_col: str = "doc_id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Connected components of an undirected pair graph by iterative
    min-label propagation: every node starts labeled with itself; each
    round every node takes the min of its own label and its neighbors'
    labels; fixpoint = each node labeled with its component's min id.

    Scale shape: one equi-join + one partial-aggregated groupBy per
    round, converging in O(component diameter) rounds — near-duplicate
    clusters are shallow (stars/cliques from shared buckets), so this
    terminates in a handful of rounds even at corpus scale. Lineage is
    cut with ``localCheckpoint`` every round so the plan stays flat.
    (For adversarially long path graphs, alternate large-star/small-star
    [Kiveris et al., "Connected Components in MapReduce"] gives
    O(log n) rounds — same join primitive, not needed for dedup graphs.)

    Returns (node, label) — label is the min doc_id of the component.
    """
    sym = (
        edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(
            edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    prev_sum = None
    try:
        for _ in range(max_iterations):
            nbr = sym.join(
                labels, sym["dst"] == labels["node"]
            ).select(F.col("src").alias("node"), "label")
            new = (
                labels.union(nbr)
                .groupBy("node")
                .agg(F.min("label").alias("label"))
            )
            # pointer jump (path halving): replace each label by ITS
            # label, so labels hop two levels per round — convergence in
            # O(log diameter) rounds instead of O(diameter)
            new = (
                new.alias("x")
                .join(
                    new.select(
                        F.col("node").alias("l_node"),
                        F.col("label").alias("l_label"),
                    ),
                    F.col("x.label") == F.col("l_node"),
                    "left",
                )
                .select(
                    F.col("x.node").alias("node"),
                    F.coalesce("l_label", "x.label").alias("label"),
                )
                # lazy: the convergence aggregate below is the
                # materializing action, so each round is ONE job — the
                # eager-checkpoint-then-join-changed-probe shape cost a
                # second full job (join + limit scan) per round
                .localCheckpoint(eager=False)
            )
            # fixpoint test fused into the materialization: labels are
            # min-folded, so they can only DECREASE — the exact label
            # sum (decimal: no int64 wrap on huge-id corpora) is
            # unchanged iff no label moved this round
            cur_sum = new.agg(
                F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
            ).first()["s"]
            # superseded localCheckpoint blocks are reclaimed by the
            # context cleaner once this reference drops (DataFrame
            # .unpersist() does NOT release checkpoint storage — it only
            # uncaches persist()/cache() entries)
            labels = new
            if prev_sum is not None and cur_sum == prev_sum:
                break
            prev_sum = cur_sum
    finally:
        sym.unpersist()
    return labels


def dedup_clusters(
    docs: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 16,
    shingle_n: int = 3,
    max_bucket_size: int = 1000,
    max_iterations: int = 25,
) -> DataFrame:
    """End-to-end near-duplicate clustering — the "keep one per cluster"
    step of a dedup pipeline: LSH proposes candidates (banded equi-join),
    exact n-gram Jaccard >= threshold confirms edges, connected
    components groups transitively-linked docs, and the min doc_id of
    each component is its canonical representative.

    Output: (doc_id, cluster_id, cluster_size, is_canonical) for every
    doc that belongs to a multi-doc cluster; downstream keeps
    ``is_canonical`` rows and drops the rest. Singleton docs never enter
    the pair graph and are implicitly kept."""
    pairs = ngram_jaccard(
        docs,
        candidates=lsh_near_duplicates(
            docs,
            mark_star=True,
            num_hashes=num_hashes,
            bands=bands,
            shingle_n=shingle_n,
            max_bucket_size=max_bucket_size,
        ),
        shingle_n=shingle_n,
        threshold=threshold,
    )
    labels = connected_components(
        pairs, "doc_id_a", "doc_id_b", max_iterations
    )
    return cluster_labels_output(labels, "doc_id")


def cluster_labels_output(labels: DataFrame, id_alias: str) -> DataFrame:
    """(node, label) component labels -> the keep-one-per-cluster shape
    shared by ``dedup_clusters`` and ``sim.ann.semantic_dedup``:
    (id_alias, cluster_id, cluster_size, is_canonical) with the min-id
    member canonical."""
    from pyspark.sql import Window as W

    return labels.select(
        F.col("node").alias(id_alias),
        F.col("label").alias("cluster_id"),
    ).select(
        id_alias,
        "cluster_id",
        F.count(F.lit(1))
        .over(W.partitionBy("cluster_id"))
        .alias("cluster_size"),
        (F.col(id_alias) == F.col("cluster_id")).alias("is_canonical"),
    )


def simhash_bits(hasher: str) -> int:
    """Signature width per hash family: 64 for xxhash64; 60 for md5 mode
    (15 hex chars -> fits a signed long in ANY engine, no sign-bit
    special-casing — the cross-engine-reproducible width)."""
    return 64 if hasher == "xxhash64" else 60


def simhash(
    docs: DataFrame, shingle_n: int = 2, hasher: str = "xxhash64"
) -> DataFrame:
    """SimHash per document from shingle hashes (64-bit, or 60-bit in
    the md5-reproducible mode — see :func:`simhash_bits`).

    For each bit position, sum(+1/-1 over shingles by bit) >= 0 -> bit set.
    Entirely with array/bit built-ins: aggregate over the shingle array
    accumulating a per-bit vote vector. Narrow inputs are fanned out
    ahead of the hash+vote stage (same rationale as
    :func:`minhash_signatures`)."""
    from gear5_spark.parallel import fan_out

    nbits = simhash_bits(hasher)
    sh = fan_out(docs).select(
        "doc_id", F.explode(shingles(F.col("text"), shingle_n)).alias("s")
    )
    if hasher == "xxhash64":
        sh = sh.withColumn("h", F.xxhash64("s"))
    elif hasher == "md5":
        # first 15 hex chars of md5 as a 60-bit long — conv() parses the
        # hex; any md5-capable engine rebuilds the identical value
        sh = sh.withColumn(
            "h", F.conv(F.substring(F.md5("s"), 1, 15), 16, 10).cast("long")
        )
    else:
        raise ValueError(f"unknown hasher {hasher!r}")
    # per-bit +1/-1 votes as nbits independent sum aggregates over the
    # exploded shingles — flat codegen, map-side partial aggregation
    votes = sh.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                ).otherwise(F.lit(-1))
            ).alias(f"v_{b}")
            for b in range(nbits)
        ]
    )
    sig_bits = [
        F.when(F.col(f"v_{b}") >= 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        for b in range(min(nbits, 63))
    ]
    if nbits == 64:
        # bit 63 would overflow a positive long literal; use the negative
        # two's-complement literal for the sign bit
        sig_bits.append(
            F.when(
                F.col("v_63") >= 0, F.lit(-(1 << 63)).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        )
    sig = sig_bits[0]
    for bcol in sig_bits[1:]:
        sig = sig.bitwiseOR(bcol)
    return votes.select("doc_id", sig.alias("simhash"))


def simhash_near_duplicates(
    docs: DataFrame,
    shingle_n: int = 2,
    max_bucket_size: int = 1000,
    hasher: str = "xxhash64",
) -> DataFrame:
    """SimHash near-dup candidates: equal quarter bands (LSH over bit
    chunks — 16 bits each at 64-bit, 15 each at the md5-mode 60-bit),
    then exact hamming distance <= 3 filter via bit_count.

    Recall guarantee: <=3 differing bits can touch at most 3 of the 4
    bands, so every true pair shares at least one band (pigeonhole) —
    band-LSH recall is exactly 1.0 for the hamming<=3 predicate.
    Hot buckets degrade to star pairing like MinHash-LSH; star edges
    pass through the hamming confirm UN-filtered (they are connectivity
    edges, not similarity claims — dropping a star-centre edge whose
    hamming exceeds 3 would disconnect mutually-similar members of the
    degraded bucket; see ``_banded_pairs``). The output carries the
    ``star`` marker alongside the measured ``hamming``: per-pair
    consumers filter ``~star`` (every non-star row is a confirmed
    hamming<=3 pair), component-dedup consumers use all edges and lose
    nothing. Without the marker a degraded bucket would silently mix
    sub-threshold connectivity edges into the similarity claims."""
    band_bits = simhash_bits(hasher) // 4
    band_mask = (1 << band_bits) - 1
    # materialize the signatures ONCE: the banding explode and both
    # confirm-join sides read this same frame, and without the
    # checkpoint each branch re-runs the whole shingle+hash+60-vote
    # aggregation (3x the dominant CPU of this operator). Signature
    # rows are (long, long) — O(corpus) skinny state; the context
    # cleaner reclaims the blocks when the result frame is dropped.
    sigs = simhash(docs, shingle_n, hasher).localCheckpoint(eager=True)
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("band"),
                        F.shiftright("simhash", q * band_bits)
                        .bitwiseAND(F.lit(band_mask))
                        .alias("bucket"),
                    )
                    for q in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    pairs = _banded_pairs(banded, max_bucket_size, mark_star=True)
    sa = sigs.select(
        F.col("doc_id").alias("doc_id_a"), F.col("simhash").alias("_sig_a")
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_id_b"), F.col("simhash").alias("_sig_b")
    )
    return (
        pairs.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            F.bit_count(
                F.col("_sig_a").bitwiseXOR(F.col("_sig_b"))
            ).alias("hamming"),
            "star",
        )
        .filter((F.col("hamming") <= 3) | F.col("star"))
        .select("doc_id_a", "doc_id_b", "hamming", "star")
    )
