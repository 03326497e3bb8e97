"""Best-snippet selection: for each result doc, the fixed-width window
of the text that covers the most query-term occurrences — the
computation behind a result page's preview (the reference shows raw
chunk prefixes; selecting the densest window is the engine-side part,
rendering it is presentation and stays out of scope like F21).

Semantics (deterministic, pure-python twin = the Spark kernel):
  * occurrences = every token-start offset where a query term appears
    as a whole token (the engine tokenizer's boundary rule: terms are
    [a-z0-9_]+ runs, matched case-insensitively);
  * the best window is the one covering the most occurrences; ties
    break to the SMALLEST start offset; windows are anchored at
    occurrence starts (standard two-pointer sweep — O(tokens));
  * docs with zero occurrences yield (start=0, n_hits=0) with the
    window clipped to the text head — callers typically filter on
    n_hits > 0.

Arrow-batched mapInPandas (row-local string work, no shuffle); the
pure-python kernel `best_window_py` is the unit-test surface.
"""

from __future__ import annotations

import re

SNIPPET_WIDTH = 160


def _occurrences(text: str, terms: set[str]) -> list[int]:
    out = []
    for m in re.finditer(r"[A-Za-z0-9_]+", text):
        if m.group(0).lower() in terms:
            out.append(m.start())
    return out


def best_window_py(text: str, terms: set[str], width: int = SNIPPET_WIDTH):
    """(start, n_hits) of the width-window covering the most query-term
    occurrences; ties to the smallest start; (0, 0) when no term
    occurs."""
    occ = _occurrences(text or "", {t.lower() for t in terms})
    if not occ:
        return 0, 0
    best_start, best_hits = occ[0], 1
    j = 0
    for i, start in enumerate(occ):
        while occ[i] - occ[j] >= width:
            j += 1
        hits = i - j + 1
        if hits > best_hits or (hits == best_hits and occ[j] < best_start):
            best_start, best_hits = occ[j], hits
    return best_start, best_hits


def best_snippets(
    docs,
    query_terms,
    width: int = SNIPPET_WIDTH,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """(doc_id, snippet_start, n_hits, snippet): densest query-term
    window per doc. Run it on the top-k RESULT set (join docs to the
    ranked ids first) — snippet work is per-result, never per-corpus."""
    terms = {str(t).lower() for t in query_terms}

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            starts, hits, snips = [], [], []
            for text in pdf[text_col]:
                text = text or ""
                s, h = best_window_py(text, terms, width)
                starts.append(s)
                hits.append(h)
                snips.append(text[s : s + width])
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "snippet_start": pd.Series(starts, dtype="int64"),
                    "n_hits": pd.Series(hits, dtype="int32"),
                    "snippet": snips,
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        gen, "doc_id long, snippet_start long, n_hits int, snippet string"
    )
