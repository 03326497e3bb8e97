"""Pure-Python BM25 oracle — no Spark, no external deps.

Stands in for the unavailable rank_bm25 package: reimplements the
BM25Okapi semantics the reference invokes at preprocessing.py:513 /
retriever.py:388 (formula restated in SURVEY.md §2.10), with the engine's
pinned parameters (k1=1.2, b=0.75, epsilon=0.25 per BASELINE.json), the
SAME tokenizer (local_search_engine_spark.functions.tokenize.tokenize_py)
and the SAME tie-break (score DESC, doc_id ASC) and summation order
(ascending term) — the rank-identity contract is engine vs this oracle.
"""

from __future__ import annotations

import math
from collections import Counter

from local_search_engine_spark import BM25_B, BM25_EPSILON, BM25_K1
from local_search_engine_spark.functions.tokenize import tokenize_py
from local_search_engine_spark.sources.corpus import gen_row


class BM25Oracle:
    def __init__(
        self,
        docs_tokens: list[list[str]],
        k1: float = BM25_K1,
        b: float = BM25_B,
        epsilon: float = BM25_EPSILON,
    ):
        self.k1, self.b, self.epsilon = k1, b, epsilon
        self.n_docs = len(docs_tokens)
        self.doc_len = [len(t) for t in docs_tokens]
        self.avgdl = sum(self.doc_len) / self.n_docs if self.n_docs else 0.0
        self.tf: list[Counter] = [Counter(t) for t in docs_tokens]
        df: Counter = Counter()
        for c in self.tf:
            for term in c:
                df[term] += 1
        self.df = dict(df)
        idf_raw = {
            t: math.log(self.n_docs - d + 0.5) - math.log(d + 0.5)
            for t, d in self.df.items()
        }
        self.avg_idf = (
            sum(idf_raw.values()) / len(idf_raw) if idf_raw else 0.0
        )
        eps = self.epsilon * self.avg_idf
        self.idf = {t: (v if v >= 0 else eps) for t, v in idf_raw.items()}
        self.idf_raw = idf_raw

    def score(self, query_tokens: list[str], doc_id: int) -> float:
        # ascending-term fold — same order as the engine's sorted aggregate
        s = 0.0
        dl = self.doc_len[doc_id]
        qt = sorted(Counter(query_tokens).items())
        for term, qtf in qt:
            tf = self.tf[doc_id].get(term, 0)
            if tf == 0:
                continue
            idf = self.idf.get(term, 0.0)
            s += (
                idf
                * qtf
                * tf
                * (self.k1 + 1.0)
                / (tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl))
            )
        return s

    def topk(self, query: str, k: int) -> list[tuple[int, int, float]]:
        """[(rank, doc_id, score)] — docs matching >=1 query term (the
        posting-list-driven domain; NO score-sign filter, because the
        BM25Okapi epsilon floor is legitimately negative on corpora with
        avg_idf < 0), (score DESC, doc_id ASC) tie-break, 1-based rank."""
        qtoks = tokenize_py(query)
        qterms = set(qtoks)
        scored = []
        for d in range(self.n_docs):
            if not any(self.tf[d].get(t, 0) for t in qterms):
                continue
            scored.append((d, self.score(qtoks, d)))
        scored.sort(key=lambda x: (-x[1], x[0]))
        return [(r + 1, d, s) for r, (d, s) in enumerate(scored[:k])]


def oracle_for_corpus(n_docs: int) -> BM25Oracle:
    """Build the oracle over the deterministic fixture corpus with the
    engine's doc_id contract: row_number over ORDER BY (repo, path,
    commit) — ASCII-only strings, so Python sort == Spark UTF8 sort."""
    rows = [gen_row(i) for i in range(n_docs)]
    rows.sort(key=lambda r: (r["repo"], r["path"], r["commit"]))
    return BM25Oracle([tokenize_py(r["content"]) for r in rows])


def sorted_corpus_rows(n_docs: int) -> list[dict]:
    rows = [gen_row(i) for i in range(n_docs)]
    rows.sort(key=lambda r: (r["repo"], r["path"], r["commit"]))
    return rows
