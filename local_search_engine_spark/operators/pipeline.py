"""Composed corpus-cleaning pipeline — the end-to-end training-data
prep flow a 100 TB pipeline runs before indexing/training:

    exact dedup (keep min-id)  ∧  quality floor  ∧  repetition filter
    ∧  benchmark decontamination  →  keep verdict per doc, with the
    failing reason(s) visible (never a silent drop).

Each signal is an existing operator (dedup.exact_dedup_keep,
textstats.quality_scores, textstats.repetition_scores,
dedup.benchmark_contamination); the composition is four 1:1 joins on
the uniform doc_id key. Scale shape: the three text-derived signals are
zero-shuffle row-local scans, exact-dedup is one digest shuffle, and
decontamination is a broadcast probe — the joins co-partition on doc_id
after the first exchange, so AQE plans the chain with one doc_id
shuffle per side at most. No reference analogue (the reference indexes
everything it is given); required by the task's training-data-pipeline
brief.
"""

from __future__ import annotations

from .dedup import benchmark_contamination, exact_dedup_keep
from .textstats import quality_scores, repetition_scores


def clean_corpus(
    docs,
    benchmark=None,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.3,
    max_dup_line_frac: float = 0.30,
    max_dup_ngram_frac: float = 0.30,
    contamination_n: int = 3,
    contamination_min_ratio: float = 0.1,
):
    """(doc_id, is_dup, quality_ok, repetition_pass, decontam_ok, keep):
    one verdict row per input doc; `filter(keep)` joined back to the
    source IS the cleaned corpus. benchmark=None skips decontamination
    (decontam_ok = true)."""
    from pyspark.sql import functions as F

    dup = exact_dedup_keep(docs, text_col, id_col).select("doc_id", "is_dup")
    # threshold the ROUNDED score: the 6-dp canonical form is the
    # cross-engine-stable value (raw float64 sums can differ in the last
    # ulp between engines and flip a doc sitting exactly on the floor)
    qual = quality_scores(docs, text_col, id_col).select(
        "doc_id", (F.round("quality", 6) >= min_quality).alias("quality_ok")
    )
    rep = repetition_scores(
        docs,
        text_col,
        id_col,
        max_dup_line_frac=max_dup_line_frac,
        max_dup_ngram_frac=max_dup_ngram_frac,
    ).select("doc_id", "repetition_pass")
    out = dup.join(qual, "doc_id").join(rep, "doc_id")
    if benchmark is not None:
        dec = benchmark_contamination(
            docs,
            benchmark,
            text_col,
            id_col,
            text_col,
            n=contamination_n,
            min_ratio=contamination_min_ratio,
        ).select("doc_id", (~F.col("is_contaminated")).alias("decontam_ok"))
        out = out.join(dec, "doc_id")
    else:
        out = out.withColumn("decontam_ok", F.lit(True))
    return out.withColumn(
        "keep",
        ~F.col("is_dup")
        & F.col("quality_ok")
        & F.col("repetition_pass")
        & F.col("decontam_ok"),
    )
