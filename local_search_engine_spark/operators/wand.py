"""Query-time top-k over the compressed index with block-max WAND
pruning (SURVEY.md §4.3 item 2). EXACT: the same top-k and the same
float scores as the brute-force DataFrame path (tests/test_wand.py
asserts bit-equality), because

  * blocks are doc-range aligned, so a window's upper bound
    UB(w) = Σ_t qtf_t · idf⁺(t) · g(block_max_tf, block_min_dl) is a
    true bound on any doc score inside the window (g is the BM25 tf
    normalizer, increasing in tf and decreasing in doc_len; idf⁺ clamps
    negative floored idf to 0). The bound is derived HERE from the
    idf-free block metadata — blocks never bake in global stats, so an
    incrementally maintained index reuses untouched shards soundly;
  * a window is skipped only when UB(w) ≤ θ (current k-th best): a
    skipped doc could at best TIE θ, and windows are processed in
    ascending doc order with the (score DESC, doc_id ASC) tie-break,
    so a tying later doc never displaces an incumbent;
  * surviving windows are scored exactly, adding per-term contributions
    in ascending term order — the same accumulation order (and the
    same expression shape, left-associative) as the brute-force path
    and the oracle, so floats reproduce bit-for-bit.

Physical plan: postings ⋈ broadcast(query idf) [term filter pushed to
the Parquet scan; term_bucket prunes partitions on a persisted index]
→ union with the shard_meta rows (meta tagged by a null term — the
meta blob moves ONCE per shard, like the cogroup it replaces, never
once per posting row) → one hash repartition on part_id → mapInPandas
(numpy decode + WAND + per-shard k-heap; r06 — the former
groupBy.cogroup.applyInPandas delivery measured 1.6 s of pure
machinery for 250 tiny shard groups at sf1.0, vs 0.6 s for this shape)
→ global orderBy/limit (planned as TakeOrderedAndProject — a
distributed k-heap, no full sort). Exactly one shuffle after the scan.
"""

from __future__ import annotations

from collections import Counter

from ..functions.tokenize import tokenize_py

_POST_COLS = [
    "part_id", "term", "block_id", "block_max_tf", "block_min_dl",
    "doc_ids_vb", "tfs_vb", "idf",
]


def _tagged_union(matched, shard_meta):
    """posts rows + meta rows in ONE relation keyed by part_id: meta
    rows carry (first_doc_id, doc_lens) with term null; posting rows
    carry null meta columns. Hash-repartitioned by part_id so a
    partition holds every row of each of its shards — the colocation
    the per-shard kernel needs — while the ~docs_per_shard·4-byte
    doc_lens blob is shipped exactly once per shard."""
    from pyspark.sql import functions as F

    posts = matched.select(
        *_POST_COLS,
        F.lit(None).cast("long").alias("_shard_first"),
        F.lit(None).cast("binary").alias("_shard_lens"),
    )
    meta = shard_meta.select(
        "part_id",
        F.lit(None).cast("string").alias("term"),
        F.lit(None).cast("long").alias("block_id"),
        F.lit(None).cast("int").alias("block_max_tf"),
        F.lit(None).cast("int").alias("block_min_dl"),
        F.lit(None).cast("binary").alias("doc_ids_vb"),
        F.lit(None).cast("binary").alias("tfs_vb"),
        F.lit(None).cast("double").alias("idf"),
        F.col("first_doc_id").alias("_shard_first"),
        F.col("doc_lens").alias("_shard_lens"),
    )
    return posts.unionByName(meta).repartition("part_id")


def _split_shards(batches):
    """Accumulate a partition's batches and yield (posts_pdf, first_doc,
    doc_lens_bytes) per shard present with BOTH posts and meta — the
    same per-key semantics as the cogroup this replaces (one-sided keys
    produce nothing)."""
    import pandas as pd

    parts = [pdf for pdf in batches if len(pdf)]
    if not parts:
        return
    allp = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
    is_meta = allp["term"].isna()
    meta = allp[is_meta]
    posts = allp[~is_meta]
    if meta.empty or posts.empty:
        return
    meta_first = dict(zip(meta["part_id"], meta["_shard_first"]))
    meta_lens = dict(zip(meta["part_id"], meta["_shard_lens"]))
    for pid, posts_pdf in posts.groupby("part_id", sort=True):
        if pid not in meta_first:
            continue
        yield posts_pdf, int(meta_first[pid]), meta_lens[pid]


def make_wand_topk(index, postings, shard_meta, block_span: int | None = None, n_buckets: int | None = None):
    """Bind a compressed index (operators/postings.py output) to a query
    function: query(text, k, prune=True) → DataFrame(rank, doc_id, score).

    n_buckets: pass the index's bucket count when postings come from a
    persisted index written partitionBy("term_bucket") — the query then
    adds term_bucket literals (computed driver-side via the portable h32
    hash, no Spark job) so the Parquet scan prunes whole bucket
    directories instead of reading the full index.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..functions.codec import DEFAULT_BLOCK_SPAN

    span = block_span or DEFAULT_BLOCK_SPAN
    k1, b_, avgdl = index.params.k1, index.params.b, index.avgdl
    spark = postings.sparkSession
    idf_small = index.idf.select("term", "idf")

    def query(text: str, k: int, prune: bool = True):
        qtf = dict(sorted(Counter(tokenize_py(text)).items()))
        if not qtf or k <= 0:
            return spark.createDataFrame([], "rank int, doc_id long, score double")
        terms = list(qtf)
        scan = postings
        if n_buckets and "term_bucket" in postings.columns:
            from ..functions.hashing import h32_py

            # bucket literals computed driver-side (hashlib) — zero jobs
            buckets = sorted({h32_py(t) % n_buckets for t in terms})
            scan = scan.filter(F.col("term_bucket").isin(buckets))
        matched = scan.filter(F.col("term").isin(terms)).join(
            F.broadcast(idf_small.filter(F.col("term").isin(terms))), "term"
        )

        def score_fn(batches):
            import numpy as np
            import pandas as pd

            from local_search_engine_spark.functions.codec import (
                decode_block,
                unpack_i32,
            )

            qw = {t: float(c) for t, c in qtf.items()}
            out_d_all: list = []
            out_s_all: list = []
            for posts_pdf, first_doc, lens_bytes in _split_shards(batches):
                doc_lens = unpack_i32(lens_bytes).astype(np.float64)
                posts_pdf = posts_pdf.sort_values(["block_id", "term"])
                # columnar extraction ONCE per shard, then pure numpy
                # block slicing (r06 — the pandas groupby/itertuples
                # machinery cost more per small shard group than the
                # decode+score work; guide §4.2). Float arithmetic order
                # is unchanged everywhere — bit-identical (test_wand).
                bid_a = posts_pdf["block_id"].to_numpy(np.int64)
                term_a = posts_pdf["term"].to_numpy()
                dvb_a = posts_pdf["doc_ids_vb"].to_numpy()
                tvb_a = posts_pdf["tfs_vb"].to_numpy()
                idf_a = posts_pdf["idf"].to_numpy(np.float64)
                # per-block upper bound from the idf-free metadata:
                # idf⁺·qtf·(k1+1)·max_tf / (max_tf + k1·(1−b+b·min_dl/avgdl))
                # — true bound (BM25 contribution increases in tf,
                # decreases in dl); idf clamped at 0 because a doc NOT
                # containing a negatively-scored term would otherwise
                # exceed the "bound" (negative floored idf is legal when
                # avg_idf < 0)
                _mt = posts_pdf["block_max_tf"].to_numpy(np.float64)
                _md = posts_pdf["block_min_dl"].to_numpy(np.float64)
                _idfp = np.maximum(idf_a, 0.0)
                _qwv = np.array([qw[t] for t in term_a], dtype=np.float64)
                _ub = (
                    _idfp
                    * _qwv
                    * _mt
                    * (k1 + 1.0)
                    / (_mt + k1 * (1.0 - b_ + b_ * _md / avgdl))
                )
                scores = np.zeros(doc_lens.size, dtype=np.float64)
                touched = np.zeros(doc_lens.size, dtype=bool)
                # running top-k as parallel numpy arrays (r05, VERDICT
                # #7): θ only matters at WINDOW boundaries (a surviving
                # window is always scored in full), so the per-touched-
                # doc Python heap pushes collapse into one vectorized
                # merge + lexsort per surviving window — same
                # (score DESC, doc_id ASC) selection, bit-identical.
                topk_s = np.empty(0, dtype=np.float64)
                topk_d = np.empty(0, dtype=np.int64)
                theta = -np.inf

                starts = np.flatnonzero(
                    np.concatenate(([True], bid_a[1:] != bid_a[:-1]))
                )
                ends = np.append(starts[1:], bid_a.size)
                for s_i, e_i in zip(starts, ends):
                    if prune and topk_s.size == k:
                        ub = float(_ub[s_i:e_i].sum())
                        if ub <= theta:
                            continue  # window cannot beat the k-th best
                    base = int(bid_a[s_i]) * span
                    for i in range(s_i, e_i):
                        d, tf = decode_block(dvb_a[i], tvb_a[i], base)
                        off = d - first_doc
                        dl = doc_lens[off]
                        tfd = tf.astype(np.float64)
                        contrib = (
                            idf_a[i]
                            * _qwv[i]
                            * tfd
                            * (k1 + 1.0)
                            / (tfd + k1 * (1.0 - b_ + b_ * dl / avgdl))
                        )
                        scores[off] += contrib
                        touched[off] = True
                    lo = max(base - first_doc, 0)
                    hi = min(base + span - first_doc, doc_lens.size)
                    offs = np.flatnonzero(touched[lo:hi]) + lo
                    if offs.size:
                        cand_s = np.concatenate((topk_s, scores[offs]))
                        cand_d = np.concatenate((topk_d, offs + first_doc))
                        touched[offs] = False
                        scores[offs] = 0.0
                        if cand_s.size > k:
                            sel = np.lexsort((cand_d, -cand_s))[:k]
                            topk_s, topk_d = cand_s[sel], cand_d[sel]
                        else:
                            topk_s, topk_d = cand_s, cand_d
                        if topk_s.size == k:
                            theta = float(topk_s.min())

                order = np.lexsort((topk_d, -topk_s))
                out_d_all.extend(topk_d[order].tolist())
                out_s_all.extend(topk_s[order].tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_d_all, dtype="int64"),
                    "score": pd.Series(out_s_all, dtype="float64"),
                }
            )

        per_shard = _tagged_union(matched, shard_meta).mapInPandas(
            score_fn, "doc_id long, score double"
        )
        topk = per_shard.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        return topk.withColumn("rank", F.row_number().over(w)).select(
            "rank", "doc_id", "score"
        )

    def query_set(queries, prune: bool = True):
        """Batch path: ALL queries against the index in ONE plan — one
        postings scan (filtered to the union of all query terms, bucket-
        pruned), one shuffle, one per-shard pandas pass that runs the
        same exact block-max WAND loop per query. Per-query results are
        identical to query() (tests assert it); wall cost amortizes the
        per-job overhead across the whole set, exactly like
        operators/query.run_query_set does for the brute-force path.

        queries: [(query_id, text, k)] → DataFrame(query_id, rank,
        doc_id, score).
        """
        qspecs = []
        for qid, text, k in queries:
            qtf = dict(sorted(Counter(tokenize_py(text)).items()))
            if qtf and k > 0:
                qspecs.append((int(qid), qtf, int(k)))
        if not qspecs:
            return spark.createDataFrame(
                [], "query_id int, rank int, doc_id long, score double"
            )
        all_terms = sorted({t for _, qtf, _ in qspecs for t in qtf})
        scan = postings
        if n_buckets and "term_bucket" in postings.columns:
            from ..functions.hashing import h32_py

            buckets = sorted({h32_py(t) % n_buckets for t in all_terms})
            scan = scan.filter(F.col("term_bucket").isin(buckets))
        matched = scan.filter(F.col("term").isin(all_terms)).join(
            F.broadcast(idf_small.filter(F.col("term").isin(all_terms))), "term"
        )

        def score_set_fn(batches):
            import numpy as np
            import pandas as pd

            from local_search_engine_spark.functions.codec import (
                decode_block,
                unpack_i32,
            )

            out_q: list = []
            out_d: list = []
            out_s: list = []
            for posts_pdf, first_doc, lens_bytes in _split_shards(batches):
                doc_lens = unpack_i32(lens_bytes).astype(np.float64)
                posts_pdf = posts_pdf.sort_values(["block_id", "term"])
                # columnar extraction once per shard (see score_fn) + a
                # term factorization so each query's row subset is an
                # int-code isin, not a per-query string isin
                bid_a = posts_pdf["block_id"].to_numpy(np.int64)
                dvb_a = posts_pdf["doc_ids_vb"].to_numpy()
                tvb_a = posts_pdf["tfs_vb"].to_numpy()
                idf_a = posts_pdf["idf"].to_numpy(np.float64)
                codes, uniques = pd.factorize(posts_pdf["term"])
                term_list = list(uniques)
                # query-independent part of the block bound (score_fn) —
                # computed once per shard, scaled by each query's qtf
                _mt = posts_pdf["block_max_tf"].to_numpy(np.float64)
                _md = posts_pdf["block_min_dl"].to_numpy(np.float64)
                _idfp = np.maximum(idf_a, 0.0)
                _ub1 = (
                    _idfp
                    * _mt
                    * (k1 + 1.0)
                    / (_mt + k1 * (1.0 - b_ + b_ * _md / avgdl))
                )
                for qid, qtf, k in qspecs:
                    pres = np.array(
                        [ci for ci, t in enumerate(term_list) if t in qtf],
                        dtype=np.int64,
                    )
                    if pres.size == 0:
                        continue
                    idxs = np.flatnonzero(np.isin(codes, pres))
                    if idxs.size == 0:
                        continue
                    qw_vals = np.array(
                        [float(qtf[term_list[codes[i]]]) for i in idxs],
                        dtype=np.float64,
                    )
                    ub_vals = _ub1[idxs] * qw_vals
                    sub_bid = bid_a[idxs]
                    scores = np.zeros(doc_lens.size, dtype=np.float64)
                    touched = np.zeros(doc_lens.size, dtype=bool)
                    # vectorized window merge — same scheme as score_fn
                    topk_s = np.empty(0, dtype=np.float64)
                    topk_d = np.empty(0, dtype=np.int64)
                    theta = -np.inf
                    starts = np.flatnonzero(
                        np.concatenate(([True], sub_bid[1:] != sub_bid[:-1]))
                    )
                    ends = np.append(starts[1:], sub_bid.size)
                    for s_i, e_i in zip(starts, ends):
                        if prune and topk_s.size == k:
                            ub = float(ub_vals[s_i:e_i].sum())
                            if ub <= theta:
                                continue
                        base = int(sub_bid[s_i]) * span
                        for j in range(s_i, e_i):
                            i = idxs[j]
                            d, tf = decode_block(dvb_a[i], tvb_a[i], base)
                            off = d - first_doc
                            dl = doc_lens[off]
                            tfd = tf.astype(np.float64)
                            contrib = (
                                idf_a[i]
                                * qw_vals[j]
                                * tfd
                                * (k1 + 1.0)
                                / (tfd + k1 * (1.0 - b_ + b_ * dl / avgdl))
                            )
                            scores[off] += contrib
                            touched[off] = True
                        lo = max(base - first_doc, 0)
                        hi = min(base + span - first_doc, doc_lens.size)
                        offs = np.flatnonzero(touched[lo:hi]) + lo
                        if offs.size:
                            cand_s = np.concatenate((topk_s, scores[offs]))
                            cand_d = np.concatenate((topk_d, offs + first_doc))
                            touched[offs] = False
                            scores[offs] = 0.0
                            if cand_s.size > k:
                                sel = np.lexsort((cand_d, -cand_s))[:k]
                                topk_s, topk_d = cand_s[sel], cand_d[sel]
                            else:
                                topk_s, topk_d = cand_s, cand_d
                            if topk_s.size == k:
                                theta = float(topk_s.min())
                    out_q.extend([qid] * topk_s.size)
                    out_d.extend(topk_d.tolist())
                    out_s.extend(topk_s.tolist())
            yield pd.DataFrame(
                {
                    "query_id": pd.Series(out_q, dtype="int32"),
                    "doc_id": pd.Series(out_d, dtype="int64"),
                    "score": pd.Series(out_s, dtype="float64"),
                }
            )

        per_shard = _tagged_union(matched, shard_meta).mapInPandas(
            score_set_fn, "query_id int, doc_id long, score double"
        )
        kmap = F.element_at(
            F.map_from_arrays(
                F.array(*[F.lit(q) for q, _, _ in qspecs]),
                F.array(*[F.lit(k) for _, _, k in qspecs]),
            ),
            F.col("query_id"),
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        return (
            per_shard.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= kmap)
            .select("query_id", "rank", "doc_id", "score")
        )

    query.query_set = query_set
    return query
