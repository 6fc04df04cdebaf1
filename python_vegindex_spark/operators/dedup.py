"""Deduplication operators for document tables at training-data scale.

Engine additions beyond the reference (which only deduplicates rows by
key on ingest — roitimeseries.py:555-582/J4,J5). Four strategies, all
shuffle-conscious:

* exact       — hash-groupBy on a normalized 64-bit fingerprint; one
                shuffle on the fingerprint (uniform by construction).
* minhash LSH — shingle -> K minhashes -> B bands; candidate pairs meet
                in a band-bucket equi-join (self-join on (band, sig)),
                then exact Jaccard verify. Avoids the O(N^2) cross join;
                band buckets are the only shuffle keys.
* simhash     — 64-bit near-dup signature via per-shingle hash bit votes;
                near-dups collide on rotated prefix buckets.
* ngram-jaccard — exact pairwise Jaccard over word n-grams for candidate
                pairs (verification primitive; not for blind N^2 use).

All JVM-side expressions (md5/xxhash64, transform/filter/aggregate on
arrays). No Python UDFs. In the minhash/simhash/LSH stages the default
base hash is the portable md5-derived one (:func:`_md5_half`) so those
stages are reproducible bit-for-bit by an independent SQL engine; pass
``hash_kind='xxhash64'`` for the faster non-cryptographic variant when
cross-engine verifiability doesn't matter. :func:`dedup_exact` defaults
the other way (xxhash64 fingerprint — its RESULT is verified by grouping
on normalized text, hash-independent); pass ``hash_kind='md5'`` there
when the fingerprint column itself must be externally reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import char_ngrams, fingerprint64, word_ngrams


def dedup_exact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_kind: str = "xxhash64",
) -> DataFrame:
    """Keep the lowest-id representative per exact (normalized) text.

    Returns (fingerprint, keep_id, dup_count). One shuffle on the
    fingerprint — effectively uniform, no skew handling needed.

    ``hash_kind``: 'xxhash64' (default) is the fast 64-bit JVM
    fingerprint; 'md5' fingerprints with the hex digest (string) when the
    fingerprint column itself must be reproducible by an external engine
    (``md5(lower(regexp_replace(trim(text), '\\s+', ' ')))`` anywhere).
    The grouping result is identical either way.
    """
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    if hash_kind == "xxhash64":
        fp = fingerprint64(F.col(text_col))
    elif hash_kind == "md5":
        fp = F.md5(norm)
    else:
        raise ValueError(f"hash_kind must be 'md5' or 'xxhash64', got {hash_kind!r}")
    return (
        df.withColumn("fingerprint", fp)
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").cast("long").alias("dup_count"),
        )
    )


def _spread(df: DataFrame, parallelism: int | None) -> DataFrame:
    """Repartition an (id, ...) projection by id so per-shingle hashing
    parallelizes even when the source arrives in FEWER partitions than
    cores (e.g. one small parquet file). Widen-only by default: a corpus
    already at or above the target partition count is left untouched —
    repartitioning it would shuffle raw document text and coalesce a
    well-partitioned 100-TB input into oversized tasks. None ->
    defaultParallelism target; 0/negative -> never repartition; an
    explicit positive value forces that exact count."""
    if parallelism is not None and parallelism <= 0:
        return df
    if parallelism is None:
        target = df.sparkSession.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() >= target:
            return df
        return df.repartition(target, "id")
    return df.repartition(parallelism, "id")


def _md5_half(col, half: int):
    """One 32-bit integer from the md5 hex digest (``half`` 0 or 1).

    The portable base hash: Spark (``conv(substr(md5(x)..), 16, 10)``),
    DuckDB (``cast(concat('0x', substr(md5(x)..)) as bigint)``) and
    Python (``int(hashlib.md5(x).hexdigest()[..], 16)``) all compute the
    identical value, so pipelines built on it are verifiable across
    engines. One md5 per shingle yields BOTH halves (Catalyst CSE merges
    the two substring probes into a single digest)."""
    return F.conv(F.substring(F.md5(col), 1 + 8 * half, 8), 16, 10).cast("long")


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
    shingle_kind: str = "word",
    hash_kind: str = "md5",
    parallelism: int | None = None,
) -> DataFrame:
    """(id, minhash array<long>) — K minhashes over word or character
    shingles (``shingle_kind``: 'word' n-grams are coarser/cheaper;
    'char' n-grams are the RefinedWeb/Gopher-style dedup unit, robust to
    tokenization differences).

    Shape chosen for throughput: explode shingles to rows, hash each
    shingle ONCE into two independent values (h1, h2), then take
    K mins of the affine family ``h1 + k*h2`` in a single hash aggregate
    (the standard 2-universal minhash construction). Each shingle is
    hashed exactly once/twice regardless of K — the naive per-k rehash is
    ~K times more string hashing and was measured 2 orders of magnitude
    slower (Catalyst inlines array lambdas per k, no CSE across them).
    One shuffle on the doc id.

    ``hash_kind``: 'md5' (default) derives (h1, h2) as the two 32-bit
    halves of one salted md5 digest — cross-engine reproducible
    (:func:`_md5_half`), so the full LSH pipeline can be independently
    verified in any SQL engine; 'xxhash64' is the faster
    non-cryptographic alternative when verifiability doesn't matter.
    Both are 2-universal-enough for the affine min family.

    ``parallelism``: the heavy work (shingle explode + one digest per
    shingle) runs in the SCAN stage, so a corpus that arrives in fewer
    partitions than cores (one small file; a coalesced upstream) hashes
    on one task. Default (None) repartitions the (id, text) projection
    by id to ``defaultParallelism`` partitions first — this does not add
    a shuffle, it MOVES the groupBy(id) shuffle before the hashing (the
    repartition satisfies the aggregate's distribution, and raw text
    is about the same shuffle bytes as the (id,h1,h2) shingle rows it
    replaces). Pass 0 to keep the input partitioning (a well-partitioned
    100-TB corpus needs no help).
    """
    if shingle_kind == "word":
        shingles = word_ngrams(F.col(text_col), shingle_n)
    elif shingle_kind == "char":
        shingles = char_ngrams(F.col(text_col), shingle_n)
    else:
        raise ValueError(f"shingle_kind must be 'word' or 'char', got {shingle_kind!r}")
    M = 2_147_483_647  # Mersenne prime 2^31-1: (h1 + k*h2) % M never overflows a long
    if hash_kind == "xxhash64":
        h1 = F.pmod(F.xxhash64("s", F.lit(seed)), F.lit(M))
        h2 = F.pmod(F.xxhash64("s", F.lit(seed + 1)), F.lit(M))
    elif hash_kind == "md5":
        salted = F.concat(F.lit(f"{seed}:"), F.col("s"))
        h1 = F.pmod(_md5_half(salted, 0), F.lit(M))
        h2 = F.pmod(_md5_half(salted, 1), F.lit(M))
    else:
        raise ValueError(f"hash_kind must be 'md5' or 'xxhash64', got {hash_kind!r}")
    keyed = _spread(df.select(F.col(id_col).alias("id"), F.col(text_col)), parallelism)
    sh = keyed.select(
        "id",
        F.explode(F.array_distinct(shingles)).alias("s"),
    ).select("id", h1.alias("h1"), h2.alias("h2"))
    mins = [
        F.min((F.col("h1") + F.lit(k) * F.col("h2")) % F.lit(M)).alias(f"_m{k}")
        for k in range(num_hashes)
    ]
    agg = sh.groupBy("id").agg(*mins)
    return agg.select(
        "id", F.array(*[F.col(f"_m{k}") for k in range(num_hashes)]).alias("minhash")
    )


def minhash_lsh_pairs(
    sigs: DataFrame, bands: int = 16, rows_per_band: int = 4, bucket_kind: str = "md5"
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH.

    Explode each signature into ``bands`` (band_id, band_hash) buckets,
    self-join on the bucket, dedupe pairs. Shuffles on the band-bucket
    key only; a pathological bucket (many identical docs) is bounded by
    the band hash's selectivity. Returns (id_a, id_b) with id_a < id_b.

    ``bucket_kind``: 'md5' (default) buckets on the md5 hex digest of the
    comma-joined band slice — reproducible in any SQL engine
    (``md5(string_agg(m, ','))`` in DuckDB) so candidate generation is
    cross-engine verifiable; 'xxhash64' packs the bucket into a long
    (8 shuffle bytes vs 32) when verifiability doesn't matter.

    Signatures must carry at least ``bands * rows_per_band`` hashes —
    enforced per row (otherwise the out-of-range band slices would all
    hash the empty array to ONE shared bucket, silently degenerating the
    self-join to O(N^2) with garbage candidates).
    """
    need = bands * rows_per_band
    sigs = sigs.withColumn(
        "minhash",
        F.when(F.size("minhash") >= need, F.col("minhash")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("minhash_lsh_pairs: signature has "),
                    F.size("minhash").cast("string"),
                    F.lit(f" hashes, need bands*rows_per_band={need}"),
                )
            )
        ),
    )
    if bucket_kind == "md5":
        def _bucket(b):
            sl = F.slice(F.col("minhash"), b * rows_per_band + 1, rows_per_band)
            return F.md5(F.concat_ws(",", sl.cast("array<string>")))
    elif bucket_kind == "xxhash64":
        def _bucket(b):
            sl = F.slice(F.col("minhash"), b * rows_per_band + 1, rows_per_band)
            return F.xxhash64(sl.cast("string"))
    else:
        raise ValueError(f"bucket_kind must be 'md5' or 'xxhash64', got {bucket_kind!r}")
    banded = sigs.select(
        "id",
        F.posexplode(
            F.transform(F.sequence(F.lit(0), F.lit(bands - 1)), _bucket)
        ).alias("band", "bucket"),
    )
    a = banded.select(F.col("id").alias("id_a"), "band", "bucket")
    b = banded.select(F.col("id").alias("id_b"), "band", "bucket")
    return (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard(
    df_pairs: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    shingle_kind: str = "word",
    parallelism: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard for (id_a, id_b) candidate pairs.

    Two broadcast-able joins to attach shingle sets, then pure array
    intersection/union — the LSH verification stage. ``shingle_kind``
    should match the one used for the signatures being verified
    ('word' or 'char', as in :func:`minhash_signatures`).

    ``parallelism`` spreads the docs-side shingle computation by id
    (see :func:`minhash_signatures`); the id repartition doubles as the
    join-side distribution. At 100-TB scale, pre-filter ``docs`` to the
    candidate ids (semi-join against a persisted ``df_pairs``) so the
    verify stage shingles O(candidates), not O(corpus).
    """
    if shingle_kind == "word":
        shingles = word_ngrams(F.col(text_col), n)
    elif shingle_kind == "char":
        shingles = char_ngrams(F.col(text_col), n)
    else:
        raise ValueError(f"shingle_kind must be 'word' or 'char', got {shingle_kind!r}")
    sh = _spread(docs.select(F.col(id_col).alias("id"), F.col(text_col)), parallelism)
    sh = sh.select("id", F.array_distinct(shingles).alias("sh"))
    out = (
        df_pairs.join(sh.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), on="id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), on="id_b")
        .withColumn(
            "inter", F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
        )
        .withColumn(
            "uni", F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
        )
        .select(
            "id_a",
            "id_b",
            # UNROUNDED single integer division: round(x, 6) is a
            # cross-engine coin flip when inter/uni lands exactly
            # midway at the 6th decimal (SURVEY §8 tie hazard)
            F.when(F.col("uni") > 0, F.col("inter") / F.col("uni"))
            .otherwise(0.0)
            .alias("jaccard"),
        )
    )
    return out


def simhash64(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    hash_kind: str = "md5",
    parallelism: int | None = None,
) -> DataFrame:
    """64-bit SimHash per doc: per-shingle hash bit votes, sign-summed.

    Bit i of the signature = majority vote of bit i across shingle
    hashes. Same explode-once-hash-once shape as minhash_signatures:
    each shingle hashed once, then 64 cheap bit-vote sums in one hash
    aggregate. Returns (id, simhash:long).

    ``hash_kind``: 'md5' (default) takes the 64 vote bits from the two
    32-bit halves of the md5 digest (bits 0-31 from the first half,
    32-63 from the second) — cross-engine reproducible
    (:func:`_md5_half`); 'xxhash64' votes on the raw xxhash bits (faster,
    not portable).
    """
    keyed = _spread(df.select(F.col(id_col).alias("id"), F.col(text_col)), parallelism)
    sh_base = keyed.select(
        "id",
        F.explode(
            F.array_distinct(word_ngrams(F.col(text_col), shingle_n))
        ).alias("s"),
    )
    if hash_kind == "xxhash64":
        sh = sh_base.select("id", F.xxhash64("s").alias("h"))

        def _bit(i):
            return F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1))
    elif hash_kind == "md5":
        sh = sh_base.select(
            "id",
            _md5_half(F.col("s"), 0).alias("h_lo"),
            _md5_half(F.col("s"), 1).alias("h_hi"),
        )

        def _bit(i):
            src, off = ("h_lo", i) if i < 32 else ("h_hi", i - 32)
            return F.shiftright(F.col(src), off).bitwiseAND(F.lit(1))
    else:
        raise ValueError(f"hash_kind must be 'md5' or 'xxhash64', got {hash_kind!r}")
    votes = [
        F.sum(F.when(_bit(i) == 1, 1).otherwise(-1)).alias(f"_v{i}")
        for i in range(64)
    ]
    agg = sh.groupBy("id").agg(*votes)
    sim = F.lit(0).cast("long")
    for i in range(64):
        bit = F.when(F.col(f"_v{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sim = sim.bitwiseOR(F.shiftleft(bit, i))
    return agg.select("id", sim.alias("simhash"))


def dedup_clusters(
    pairs: DataFrame,
    ids: DataFrame | None = None,
    max_iters: int = 20,
) -> DataFrame:
    """Connected components over near-dup pairs -> (id, cluster_id).

    ``pairs`` is (id_a, id_b) from :func:`minhash_lsh_pairs` /
    embedding near-dup; ``cluster_id`` is the minimum member id, so the
    canonical survivor of each duplicate cluster is the row with
    ``id == cluster_id``. Optional ``ids`` (one ``id`` column) adds
    singleton docs so every doc receives a cluster.

    Algorithm: min-label propagation WITH pointer doubling — each round
    (a) every node takes the minimum label in its closed neighborhood
    (one join + one map-side-combinable min aggregate), then (b) labels
    are compressed through themselves (``l <- l(l(id))``, one self-join),
    so the effective propagation distance doubles per round and
    convergence is O(log diameter) rounds (the shuffle-based CC family
    of Kiveris et al.'s star-contraction / hash-to-min). No GraphX
    dependency, no driver-side union-find; every round shuffles only
    (node, label) pairs, never payloads. Convergence is checked with a
    cheap count action; lineage is truncated per round via
    localCheckpoint so plans stay flat.
    """
    e = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    edges = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # materialize once: edges are re-joined every round, and without this
    # the whole upstream candidate-pair pipeline (LSH, Jaccard verify)
    # would re-execute per iteration
    edges = edges.localCheckpoint(eager=True)
    nodes = edges.select(F.col("src").alias("id")).distinct()
    if ids is not None:
        nodes = nodes.union(ids.select(F.col(ids.columns[0]).alias("id"))).distinct()
    labels = nodes.select("id", F.col("id").alias("cluster_id"))
    for _ in range(max_iters):
        # (a) closed-neighborhood min
        neigh = (
            edges.join(labels, edges.src == labels.id)
            .select(F.col("dst").alias("id"), "cluster_id")
            .union(labels)
        )
        # checkpoint BEFORE the self-join: truncates lineage per round
        # and gives the x/y aliases distinct attribute ids (avoids a
        # Catalyst self-join resolution bug on deep upstream plans)
        prop = (
            neigh.groupBy("id")
            .agg(F.min("cluster_id").alias("cluster_id"))
            .localCheckpoint(eager=True)
        )
        # (b) pointer doubling: follow the label's own label (labels are
        # node ids, so every label target has a row; min-monotone, so
        # l(l(id)) <= l(id) and coalesce keeps roots unchanged)
        x, y = prop.alias("x"), prop.alias("y")
        new_labels = (
            x.join(y, F.col("x.cluster_id") == F.col("y.id"), "left")
            .select(
                F.col("x.id").alias("id"),
                F.coalesce(F.col("y.cluster_id"), F.col("x.cluster_id")).alias(
                    "cluster_id"
                ),
            )
        )
        changed = (
            labels.alias("o")
            .join(new_labels.alias("n"), on="id")
            .filter(F.col("o.cluster_id") != F.col("n.cluster_id"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_keep_canonical(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Drop every near-duplicate except its cluster's minimum-id member.

    Docs never seen in ``pairs`` pass through untouched (left join +
    filter, no shuffle of the doc payload beyond the id join)."""
    clusters = dedup_clusters(pairs)
    losers = clusters.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias(id_col)
    )
    return docs.join(losers, on=id_col, how="left_anti")


def simhash_pairs(
    sigs: DataFrame,
    hamming_max: int = 3,
    tables: int = 4,
    prefix_bits: int | None = None,
) -> DataFrame:
    """Near-dup pairs from 64-bit SimHashes: (id_a, id_b, hamming).

    Charikar/Manku-style multi-table block blocking: rotate each
    signature into ``tables`` positions of 64/tables bits; candidates
    collide on the top ``prefix_bits`` (default 64//tables, i.e. exactly
    one disjoint block per table), then are verified exactly with
    bit_count(xor) <= hamming_max. With the defaults the blocks are
    disjoint and cover all 64 bits, so by pigeonhole ANY pair with
    ``hamming < tables`` shares at least one clean block — recall is 1.0
    for hamming_max < tables (raise ``tables`` for larger radii; recall
    above the guarantee degrades gracefully). Shuffle key = (table,
    block bucket) only — never an N^2 self-join; all JVM expressions.
    """
    if tables < 1 or 64 % tables != 0:
        raise ValueError(
            f"tables must divide 64 evenly (got {tables}): the rotated "
            "blocks would otherwise cover only tables*(64//tables) bits "
            "and the pigeonhole recall guarantee breaks"
        )
    rot = 64 // tables
    if prefix_bits is None:
        prefix_bits = rot
    if not 1 <= prefix_bits <= rot:
        raise ValueError(
            f"prefix_bits must be in [1, {rot}] for tables={tables} "
            f"(got {prefix_bits}): wider prefixes overlap adjacent blocks "
            "and void the disjoint-block pigeonhole argument"
        )
    sig = F.col("simhash")

    def _rotl(c, k):
        if k == 0:
            return c
        # logical rotate-left on the 64-bit pattern (shiftrightunsigned)
        return F.shiftleft(c, k).bitwiseOR(F.shiftrightunsigned(c, 64 - k))

    banded = sigs.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(_rotl(sig, t * rot), 64 - prefix_bits)
                    for t in range(tables)
                ]
            )
        ).alias("table", "bucket"),
    )
    a = banded.select(F.col("id").alias("id_a"), F.col("simhash").alias("sig_a"), "table", "bucket")
    b = banded.select(F.col("id").alias("id_b"), F.col("simhash").alias("sig_b"), "table", "bucket")
    return (
        a.join(b, on=["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= hamming_max)
        .distinct()
    )
