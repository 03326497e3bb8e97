"""The engine's single tokenizer — applied identically at index time and
query time.

The reference is self-inconsistent: index-time spaCy lemmatization
(reference tokenizer.py:38-75) vs query-time nltk word_tokenize
(reference retriever.py:380) — lemmatized index terms often can't match
raw query tokens (SURVEY.md §4.1 defect 4). For a *code* corpus English
lemmatization is wrong anyway, so per SURVEY.md §7.3 we pin ONE
deterministic rule, shared verbatim with the pure-Python oracle:

  split on non-[A-Za-z0-9_], lowercase, drop tokens of length < 2
  (mirrors reference tokenizer.py:69-70) unless in the preserve-list of
  short tech terms (mirrors reference tokenizer.py:29-33).

Three implementations with identical semantics (tests assert equality):
  tokenize_py    — pure Python (oracle + driver-side query tokenization)
  tokenize_expr  — Spark built-in expressions (JVM-side, WholeStageCodegen;
                   the DEFAULT index-time path — no Python in the hot loop)
  tokenize_udf   — Arrow-vectorized pandas UDF (north_star names this
                   path; kept as the extension point for tokenizers that
                   built-ins can't express, e.g. BPE)
"""

# NOTE: no `from __future__ import annotations` here — PySpark resolves
# pandas_udf type hints at definition time and stringified hints break it.
import re

# Reference keeps short tech terms verbatim (tokenizer.py:29-33); all are
# 2 chars so with the len>=2 rule the list is belt-and-braces — kept as
# declared API because a caller may lower the length cutoff.
PRESERVE_TERMS = frozenset({"ai", "ml", "js", "ip", "db", "os", "io"})
MIN_TOKEN_LEN = 2

TOKEN_SPLIT_RE = "[^a-z0-9_]+"
_SPLIT = re.compile(TOKEN_SPLIT_RE)


def tokenize_py(text: str) -> list[str]:
    """Pure-Python tokenizer — the oracle's and the query-side's."""
    if not text:
        return []
    return [
        t
        for t in _SPLIT.split(text.lower())
        if len(t) >= MIN_TOKEN_LEN or t in PRESERVE_TERMS
    ]


def tokenize_expr(col):
    """Built-in-expression tokenizer: Column[string] → Column[array<string>].

    Entirely JVM-side (split/lower/filter are codegen'd) — the fast path
    for index builds; no serialization to Python workers.
    """
    from pyspark.sql import functions as F

    toks = F.split(F.lower(col), TOKEN_SPLIT_RE)
    preserve = [F.lit(t) for t in sorted(PRESERVE_TERMS)]
    return F.filter(
        toks,
        lambda t: (F.length(t) >= MIN_TOKEN_LEN) | t.isin(*preserve),
    )


def tokenize_udf():
    """Arrow-vectorized pandas UDF with semantics identical to
    tokenize_py/tokenize_expr (asserted in tests/test_tokenizer.py)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _tok(s: pd.Series) -> pd.Series:
        return s.map(lambda x: tokenize_py(x) if x is not None else [])

    return _tok
