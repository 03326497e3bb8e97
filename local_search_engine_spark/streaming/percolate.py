"""Percolation — standing phrase queries matched against a document
stream (reverse search: queries are stored, documents arrive; the
capability Elasticsearch calls a percolator). Alerting / routing /
saved-search shape: "tell me whenever a crawled doc contains the phrase
X".

No reference analogue (the reference only searches a static index); the
engine's positional phrase family (operators/positional.py) supplies
the matching semantics — positions in the engine's filtered token
stream, same tokenizer both sides — and this module applies them
per-document with NO index and NO state:

  * The standing query set is tokenized once on the driver and shipped
    in the task closure (standing sets are small — thousands of
    phrases, not documents).
  * The kernel builds ONE batch-level positional posting map per Arrow
    batch (composite key doc_idx·2³² + position, the same encoding
    operators/positional.py uses for its block intersects) and answers
    every standing phrase with chained `np.intersect1d(assume_unique)`
    over term posting arrays — the whole batch is matched per phrase in
    a handful of numpy set ops instead of a per-document, per-position
    Python loop (r05 kernel vectorization: 40 k docs / 211 MB / 100
    standing phrases went 13.0 s → measured in BENCH §11; the old
    kernel's match loop was 85 % of its cost).
  * Tokenization stays IN the kernel on raw text. The "obvious"
    alternative — JVM tokenize_expr before the Arrow exchange — was
    measured 2.4× SLOWER end-to-end (31.9 s vs 13.0 s on the same
    input): shipping 33 M tokens as Arrow list<string> costs far more
    than the compiled-regex split it avoids, because every token
    becomes a Python object during pandas conversion while tokenize is
    only ~5 % of kernel time. Measurement over intuition; numbers in
    BENCH/BASELINE.md §11.
  * percolate (batch twin) and percolate_stream are the SAME narrow
    Arrow mapInPandas transformation — zero shuffle, zero streaming
    state (stateless matching needs no watermark; state stores are for
    cross-row semantics, which percolation doesn't have). Throughput
    scales linearly with executors at ANY corpus rate; the batch twin
    defines the semantics and is pinned against a DuckDB zipped-unnest
    matcher and the positional index path in tests/test_percolate.py.
"""

from __future__ import annotations

from typing import Callable

from ..functions.tokenize import tokenize_py

_DOC_SHIFT = 2**32  # composite key: doc_idx * 2^32 + position


def _out_schema(df, id_col: str) -> str:
    """Output schema keeps the caller's id column name AND type —
    percolation never does id arithmetic, so string paths / long ids /
    anything hashable passes straight through."""
    id_type = df.schema[id_col].dataType.simpleString()
    return f"{id_col} {id_type}, query_id int, phrase_tf long"


def _match_batches_fn(
    specs: list[tuple[int, list[str]]],
    text_col: str,
    id_col: str,
    tokenizer: Callable[[str], list[str]],
):
    """mapInPandas kernel shared by the batch and streaming shapes.
    specs: [(query_id, phrase_tokens)] — pre-tokenized, non-empty.

    Per batch: tokenize each doc, build a term → sorted-composite-key
    posting map for the WHOLE batch in one numpy grouping pass, then
    per phrase chain intersect1d over (posting(q[k]) − k). A composite
    survivor at offset 0 is a phrase start; doc_idx = key >> 32 and a
    np.unique over survivors yields per-doc phrase_tf. Positions never
    approach 2³², so a +k probe cannot cross a document boundary."""

    def fn(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            texts = pdf[text_col]
            flat_toks: list[str] = []
            doc_lens: list[int] = []
            for text in texts:
                toks = tokenizer(text if text is not None else "")
                flat_toks.extend(toks)
                doc_lens.append(len(toks))
            if not flat_toks:
                continue
            lens = np.asarray(doc_lens, dtype=np.int64)
            # composite keys, grouped by term code via one stable argsort;
            # hash-based pd.factorize beats sort-based np.unique ~5× on
            # object-dtype token arrays (measured, BENCH §11)
            doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
            pos_in_doc = np.concatenate([np.arange(n, dtype=np.int64) for n in doc_lens if n])
            comp = doc_idx * _DOC_SHIFT + pos_in_doc
            inv, terms = pd.factorize(np.asarray(flat_toks, dtype=object))
            order = np.argsort(inv, kind="stable")
            grouped = comp[order]  # per-term runs, ascending within each run
            starts = np.searchsorted(inv[order], np.arange(len(terms) + 1))
            tid = {t: i for i, t in enumerate(terms)}

            ids_np = pdf[id_col].to_numpy()
            out_frames = []
            for qid, q in specs:
                arr = None
                for k, t in enumerate(q):
                    i = tid.get(t)
                    if i is None:
                        arr = None
                        break
                    p = grouped[starts[i]:starts[i + 1]]
                    arr = p if arr is None else np.intersect1d(
                        arr, p - k, assume_unique=True
                    )
                    if arr.size == 0:
                        arr = None
                        break
                if arr is None:
                    continue
                hit_docs, counts = np.unique(arr // _DOC_SHIFT, return_counts=True)
                out_frames.append(
                    pd.DataFrame(
                        {
                            id_col: ids_np[hit_docs],
                            "query_id": np.full(len(hit_docs), qid, dtype=np.int32),
                            "phrase_tf": counts.astype(np.int64),
                        }
                    )
                )
            if out_frames:
                yield pd.concat(out_frames, ignore_index=True)

    return fn


def _tokenize_specs(phrases, tokenizer) -> list[tuple[int, list[str]]]:
    specs = []
    for qid, text in phrases:
        q = tokenizer(text)
        if q:
            specs.append((int(qid), q))
    return specs


def percolate(
    docs,
    phrases: list[tuple[int, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    tokenizer: Callable[[str], list[str]] = tokenize_py,
):
    """Batch twin: (doc_id, query_id, phrase_tf) for every document
    containing each standing phrase at least once. Narrow plan — one
    Arrow pass over the scan, no shuffle (plan pinned in tests)."""
    specs = _tokenize_specs(phrases, tokenizer)
    spark = docs.sparkSession
    if not specs:
        return spark.createDataFrame([], _out_schema(docs, id_col))
    return docs.select(id_col, text_col).mapInPandas(
        _match_batches_fn(specs, text_col, id_col, tokenizer),
        _out_schema(docs, id_col),
    )


def percolate_stream(
    stream,
    phrases: list[tuple[int, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    tokenizer: Callable[[str], list[str]] = tokenize_py,
):
    """Streaming shape: the identical stateless transformation over a
    streaming DataFrame (caller attaches the sink). No watermark, no
    state store — restart safety comes entirely from the sink's
    checkpoint + source offsets."""
    specs = _tokenize_specs(phrases, tokenizer)
    if not specs:
        raise ValueError("percolate_stream needs at least one non-empty phrase")
    return stream.select(id_col, text_col).mapInPandas(
        _match_batches_fn(specs, text_col, id_col, tokenizer),
        _out_schema(stream, id_col),
    )
