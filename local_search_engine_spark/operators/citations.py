"""Citation phrase matching — the deterministic core of the reference's
answer-citation extraction (reference answer_generator.py:125-148):
for each of the top results, split its text into '.'-separated phrases,
keep phrases longer than 20 chars (stripped), and cite the result if ANY
of its phrases appears case-insensitively in the answer text — at most
one citation per result (the reference breaks on first hit; we emit the
matching-phrase count instead, which subsumes it).

The LLM that produces the answer is out of engine scope (SURVEY.md W6);
this operator is the pipeline seam it plugs into. Pure DataFrame ops:
split → explode → trim/length filter → substring containment.
"""

from __future__ import annotations

DEFAULT_MAX_RESULTS = 5  # reference max_context_length (answer_generator.py:40)
DEFAULT_MIN_PHRASE_LEN = 21  # reference: len(phrase.strip()) > 20


def phrase_citations(
    results,
    answer_text: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    score_col: str = "score",
    max_results: int = DEFAULT_MAX_RESULTS,
    min_phrase_len: int = DEFAULT_MIN_PHRASE_LEN,
):
    """results: ranked rows carrying (rank, doc_id, score, text).
    Returns (doc_id, rank, score, n_matching_phrases) for cited results.
    """
    from pyspark.sql import functions as F

    ans = (answer_text or "").lower()
    top = results.filter(F.col(rank_col) <= max_results)
    phrases = top.select(
        id_col,
        rank_col,
        score_col,
        F.explode(F.split(F.col(text_col), r"\.")).alias("phrase"),
    ).withColumn("phrase", F.trim(F.col("phrase")))
    sig = phrases.filter(F.length("phrase") >= min_phrase_len)
    hits = sig.filter(F.instr(F.lit(ans), F.lower(F.col("phrase"))) > 0)
    return hits.groupBy(id_col, rank_col, score_col).agg(
        F.count("*").cast("long").alias("n_matching_phrases")
    )
