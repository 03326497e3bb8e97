"""PII / secret scrubbing — the redaction stage every training-data
pipeline runs before a corpus ships (emails, IPv4 addresses, long hex
secrets such as API tokens / digest-shaped credentials).

No reference analogue (the reference indexes local files as-is); this is
part of the beyond-reference pipeline surface the task requires. Design
constraints at 100 TB:

  * pure row-wise JVM regex (`regexp_extract_all` / `regexp_replace`
    built-ins) — zero shuffle, whole-stage codegen, embarrassingly
    parallel;
  * patterns restricted to the syntax Java regex and RE2 (DuckDB) share
    (no lookaround, no backrefs) so the oracle can replicate the scrub
    byte-for-byte;
  * counts are computed per pattern on the ORIGINAL text (independent,
    order-free); the scrubbed text applies replacements in a fixed
    documented order (email → ipv4 → hex secret) so output is
    deterministic.
"""

from __future__ import annotations

# ordered: replacements applied top to bottom; tokens inserted by one
# replacement never match a later pattern (<EMAIL>/<IP> contain no hex
# run, '@', or dotted quad)
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "<IP>"),
    ("hex_secret", r"[0-9a-fA-F]{32,}", "<SECRET>"),
]


def pii_scrub(docs, text_col: str = "text", id_col: str = "doc_id"):
    """(doc_id, scrubbed, n_email, n_ipv4, n_hex_secret): redacted text
    plus per-pattern match counts (counted on the original text)."""
    from pyspark.sql import functions as F

    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
        .cast("int")
        .alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    scrubbed = F.col(text_col)
    for _, pat, repl in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return docs.select(
        F.col(id_col).alias("doc_id"), scrubbed.alias("scrubbed"), *counts
    )


def pii_scrub_sql(text_expr: str = "text", id_expr: str = "doc_id") -> str:
    """DuckDB twin of pii_scrub over the same patterns (RE2 needs the
    explicit 'g' flag where Spark's regexp_replace is global)."""
    counts = ", ".join(
        f"len(regexp_extract_all({text_expr}, '{pat}'))::int AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    scrubbed = text_expr
    for _, pat, repl in PII_PATTERNS:
        scrubbed = f"regexp_replace({scrubbed}, '{pat}', '{repl}', 'g')"
    return f"SELECT {id_expr} AS doc_id, {scrubbed} AS scrubbed, {counts}"
