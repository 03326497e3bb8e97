"""Deduplication operators for large-scale training-data pipelines.

The reference has no dedup at all (closest: the per-result redundancy
cosine check at reference retriever.py:485-517, threshold 0.85 — covered
here by embedding_neardup_pairs). These are the first-class operators a
100 TB corpus pipeline needs; all are pure DataFrame ops (no per-row
Python) and every one has a SQL-expressible oracle via the portable
md5-based hashing in functions/hashing.py.

Scale notes (designed for a 1000-executor cluster, tested on local[32]):
  * exact_dedup: one hash-shuffle on a 16-byte digest — the canonical
    map-side-combinable groupBy; no skew (digests are uniform).
  * shingle/jaccard: the self-join on shingle is the classic quadratic
    trap; minhash_lsh_pairs is the scale path — candidate generation
    shuffles on (band_id, band_key) buckets only, and verification joins
    only candidate pairs. Hot buckets (boilerplate shingles) are bounded
    by banding; a df-style cap on pathological buckets is exposed via
    max_bucket_size.
  * simhash: per-doc signature via one explode + two aggregations; join
    on rotated signature bands would give Hamming-neighbour candidates.
"""

from __future__ import annotations

from ..functions.hashing import MERSENNE_P, N_PERMS, h32_col, minhash_col
from ..functions.tokenize import tokenize_expr

SIMHASH_BITS = 32


def exact_dedup_groups(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Exact duplicate groups by content digest.

    Returns (text_md5, n_docs, min_doc_id, doc_ids_csv): one row per
    distinct content; n_docs > 1 marks a duplicate cluster. doc_ids_csv
    is a deterministic ascending comma list (portable across engines —
    array<->list hashing differs, strings don't).
    """
    from pyspark.sql import functions as F

    return (
        docs.select(F.md5(F.col(text_col)).alias("text_md5"), F.col(id_col).alias("doc_id"))
        .groupBy("text_md5")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            # sort numerically BEFORE casting to string ("10" < "2" lexically)
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list("doc_id")), lambda x: x.cast("string")
                ),
            ).alias("doc_ids_csv"),
        )
    )


def doc_shingles(docs, text_col: str = "text", id_col: str = "doc_id", n: int = 3):
    """(doc_id, shingle) — distinct word n-gram shingles per doc.

    Tokenization is the engine's single tokenizer (functions/tokenize.py);
    shingles are space-joined token n-grams. Built entirely from JVM-side
    array expressions: transform over a sequence of start offsets, then
    explode — no Python in the hot path.
    """
    from pyspark.sql import functions as F

    toks = tokenize_expr(F.col(text_col))
    # guard: sequence(0, -1) would be a DESCENDING range in Spark, so docs
    # with fewer than n tokens must short-circuit to an empty array
    sh = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(sh).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
):
    """Exact n-gram Jaccard near-dup pairs (a < b, jaccard >= threshold).

    Self-join on shared shingles counts |A ∩ B|; sizes give the union.
    Quadratic in cluster size — the exact/verification path. At scale,
    generate candidates with minhash_lsh_pairs first and verify only
    those; this operator IS that verification when given candidate pairs.
    """
    from pyspark.sql import functions as F

    sh = doc_shingles(docs, text_col, id_col, n).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def minhash_signatures(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    shingles=None,
):
    """(doc_id, perm, sig): MinHash signature rows, perm in 0..N_PERMS-1.

    sig(doc, p) = min over shingles of ((a_p * h32(shingle) + b_p) mod P).
    All N_PERMS mins are computed in ONE groupBy(doc_id) with N_PERMS
    min-expressions — map-side partial aggregation shrinks each input
    partition to one 16-column row per doc before the (unskewed,
    doc-keyed) shuffle. This beats exploding the perm dimension by ~N_PERMS×
    in shuffled rows. posexplode of the final 16-wide row restores the
    tall (doc_id, perm, sig) shape downstream code expects.

    shingles: optionally pass a precomputed doc_shingles() DataFrame so
    callers (minhash_lsh_pairs) share one cached shingle scan between
    signature generation and candidate verification.
    """
    from pyspark.sql import functions as F

    from ..functions.hashing import MINHASH_A, MINHASH_B

    sh = shingles if shingles is not None else doc_shingles(docs, text_col, id_col, n)
    sh = sh.withColumn("h", h32_col(F.col("shingle")))
    aggs = [
        F.min(
            F.pmod(
                F.lit(MINHASH_A[p]) * F.col("h") + F.lit(MINHASH_B[p]),
                F.lit(MERSENNE_P),
            )
        ).alias(f"s{p}")
        for p in range(N_PERMS)
    ]
    wide = sh.groupBy("doc_id").agg(*aggs)
    return wide.select(
        "doc_id",
        F.posexplode(F.array(*[F.col(f"s{p}") for p in range(N_PERMS)])).alias(
            "perm", "sig"
        ),
    )


def minhash_lsh_pairs(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    bands: int = 4,
    threshold: float = 0.5,
    max_bucket_size: int = 1000,
):
    """MinHash + LSH banded candidate generation, then EXACT Jaccard
    verification of candidates only — the scale path for near-dedup.

    Band key = csv of the band's signature rows; docs sharing any band
    key are candidates. max_bucket_size drops pathological boilerplate
    buckets (logged cap — a bucket of B docs yields B^2 pairs).
    Returns (a, b, jaccard) with jaccard >= threshold, verified exactly.
    """
    from pyspark.sql import functions as F

    rows_per_band = N_PERMS // bands
    sh = doc_shingles(docs, text_col, id_col, n).cache()
    sig = minhash_signatures(docs, text_col, id_col, n, shingles=sh)
    banded = (
        sig.withColumn("band", (F.col("perm") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.concat_ws(",", F.transform(F.array_sort(F.collect_list(F.struct("perm", "sig"))), lambda s: s["sig"].cast("string"))).alias("band_key")
        )
    )
    sized = banded.groupBy("band", "band_key").agg(F.collect_list("doc_id").alias("ids"))
    capped = sized.filter(F.size("ids") <= max_bucket_size)
    x = capped.select("band", "band_key", F.explode("ids").alias("a"))
    y = capped.select("band", "band_key", F.explode("ids").alias("b"))
    cand = (
        x.join(y, ["band", "band_key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    # exact verification join against the SAME cached shingle sets,
    # candidates only
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    ia = sh.select(F.col("doc_id").alias("a"), "shingle")
    ib = sh.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        cand.join(ia, "a")
        .join(ib, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def simhash_signatures(docs, text_col: str = "text", id_col: str = "doc_id"):
    """(doc_id, simhash): 32-bit SimHash over tf-weighted term hashes.

    bit_j(sim) = 1 iff Σ_terms tf(t,d) * (2*bit_j(h32(t)) - 1) > 0.
    Plan: tokenize → tf agg → explode 32 bit positions → weighted-sum agg
    → pack bits. Two shuffles, both on doc-keyed (unskewed) keys.
    """
    from pyspark.sql import functions as F

    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokenize_expr(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    th = tf.withColumn("h", h32_col(F.col("term")))
    # All 32 bit-sums in ONE groupBy(doc_id) aggregation (map-side
    # combinable) instead of exploding the bit dimension ×32 through the
    # shuffle; the final bit-pack is a pure column expression.
    aggs = [
        F.sum(
            F.col("tf")
            * (F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"b{j}")
        for j in range(SIMHASH_BITS)
    ]
    wide = th.groupBy("doc_id").agg(*aggs)
    packed = None
    for j in range(SIMHASH_BITS):
        bit = F.when(F.col(f"b{j}") > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        packed = bit if packed is None else packed + bit
    return wide.select("doc_id", packed.alias("simhash"))


def embedding_neardup_pairs(embeddings, id_col: str = "vec_id", vec_col: str = "embedding", threshold: float = 0.95):
    """Near-dup pairs by embedding cosine >= threshold (a < b).

    Generalizes the reference's redundancy check (reference
    retriever.py:499-517, cosine > 0.85 over result embeddings) to a
    distributed pairwise operator. Brute-force O(n^2) cross join — the
    exact small-N path; at scale, bucket with SRP-LSH (similarity.py)
    and verify within buckets (same shape as minhash_lsh_pairs).
    """
    from pyspark.sql import functions as F

    v = embeddings.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    a = v.select(F.col("id").alias("a"), F.col("v").alias("va"))
    b = v.select(F.col("id").alias("b"), F.col("v").alias("vb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    return (
        a.join(b, F.col("a") < F.col("b"))
        .withColumn("cosine", dot / (norm(F.col("va")) * norm(F.col("vb"))))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )
