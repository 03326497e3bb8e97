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
    phrases, not documents). Per document, matching first probes a
    term-set guard (every phrase term must occur in the doc — a hash
    lookup per term) and only then counts occurrences along the first
    term's positions, so the per-doc cost is
    O(tokens + Σ_{surviving phrases} tf(first term) · L).
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
):
    """mapInPandas kernel shared by the batch and streaming shapes.
    specs: [(query_id, phrase_tokens)] — pre-tokenized, non-empty."""

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            out_d, out_q, out_c = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = tokenize_py(text if text is not None else "")
                if not toks:
                    continue
                pos: dict[str, list[int]] = {}
                for i, t in enumerate(toks):
                    pos.setdefault(t, []).append(i)
                posset = {t: set(p) for t, p in pos.items()}
                for qid, q in specs:
                    if any(t not in posset for t in q):
                        continue  # term-set guard: cheap reject
                    c = 0
                    for p in pos[q[0]]:
                        if all(p + i in posset[q[i]] for i in range(1, len(q))):
                            c += 1
                    if c:
                        out_d.append(doc_id)
                        out_q.append(qid)
                        out_c.append(c)
            if out_d:
                yield pd.DataFrame(
                    {
                        id_col: pd.Series(out_d),
                        "query_id": pd.Series(out_q, dtype="int32"),
                        "phrase_tf": pd.Series(out_c, dtype="int64"),
                    }
                )

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
        _match_batches_fn(specs, text_col, id_col), _out_schema(docs, id_col)
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
        _match_batches_fn(specs, text_col, id_col), _out_schema(stream, id_col)
    )
