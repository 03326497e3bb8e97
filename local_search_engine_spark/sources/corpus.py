"""Deterministic synthetic source-code corpus + corpus source abstraction.

The reference repo ships no test data (no tests at all; its .gitignore:9
names an absent test_documents/ dir), so FIXTURES.md defines the corpus:
every value is a pure function of (seed=42, row index i) — generatable
identically, in any partition order, by the Spark engine, the pure-Python
oracle (tests/oracle.py), and the bench harness. Input-table shape is
exactly BASELINE.json input_hint: (repo, path, commit, lang, content).

This module is importable WITHOUT pyspark (the oracle uses it); all
pyspark imports are lazy.
"""

from __future__ import annotations

import hashlib

SEED = 42

CORPUS_SCHEMA = (
    "repo string, path string, commit string, lang string, content string"
)

# Term pools (FIXTURES.md §1.1): hot terms appear in ~every doc (exercises
# negative raw IDF → epsilon floor, and hot-term skew), medium terms have
# df ≈ 5-30%, kw{0..199} is the long-tail vocabulary, uniq_<hex8> rare
# identifiers exercise high IDF + partition pruning.
HOT_TERMS = ("def", "import", "return", "self", "the")
MED_TERMS = ("parse", "index", "token", "query", "merge", "shard", "buffer", "config")
N_KW = 200

_EXTS = {0: (".md", "markdown"), 1: (".java", "java"), 2: (".sql", "sql")}


def _h(*parts) -> int:
    """Per-row 64-bit PRNG: int of first 8 bytes of sha256('42:<parts>')."""
    s = f"{SEED}:" + ":".join(str(p) for p in parts)
    return int.from_bytes(hashlib.sha256(s.encode()).digest()[:8], "big")


def _build_tie_doc() -> str:
    """Fixed document shared verbatim by every doc with i % 13 == 0.

    Identical content → identical tf, doc_len, and therefore *exactly*
    equal BM25 scores: pins the (score DESC, doc_id ASC) tie-break rule
    (SURVEY.md §2.5) and feeds the exact-dedup operators.
    """
    lines = []
    for j in range(25):
        r = _h("tie", j)
        n_tok = 5 + r % 7
        toks = []
        for t in range(n_tok):
            rt = _h("tie", j, t)
            c = rt % 100
            if c < 30:
                toks.append(HOT_TERMS[rt % len(HOT_TERMS)])
            elif c < 55:
                toks.append(MED_TERMS[(rt // 7) % len(MED_TERMS)])
            elif c < 65:
                toks.append("tiebait")
            else:
                toks.append(f"kw{(rt // 13) % N_KW}")
        lines.append(" ".join(toks))
    return "\n".join(lines)


TIE_DOC = _build_tie_doc()


def rare_tag(i: int) -> str:
    return hashlib.sha256(str(i).encode()).hexdigest()[:8]


def has_rare(i: int) -> bool:
    return i % 13 != 0 and _h(i, "rare") % 10 == 0


def content_for(i: int) -> str:
    """Deterministic pseudo-source text for row i (FIXTURES.md §1.1)."""
    if i % 13 == 0:
        return TIE_DOC
    n_lines = 20 + _h(i) % 181
    lines = []
    for j in range(n_lines):
        r = _h(i, "line", j)
        n_tok = 4 + r % 9
        toks = []
        for t in range(n_tok):
            rt = _h(i, "tok", j, t)
            c = rt % 100
            if c < 35:
                toks.append(HOT_TERMS[rt % len(HOT_TERMS)])
            elif c < 60:
                toks.append(MED_TERMS[(rt // 7) % len(MED_TERMS)])
            elif c < 90:
                toks.append(f"kw{(rt // 13) % N_KW}")
            else:
                # unique identifiers (like real code: every file defines its
                # own function/variable names) — df≈1 terms dominate the
                # vocabulary, keeping avg_idf positive so the epsilon floor
                # is positive (as on real corpora) and WAND upper bounds
                # stay meaningful.
                toks.append(f"u{rt >> 20:011x}")
        lines.append(" ".join(toks))
    if has_rare(i):
        lines.insert(len(lines) // 2, f"uniq_{rare_tag(i)} marker anchor")
    return "\n".join(lines)


def gen_row(i: int) -> dict:
    e = _h(i, "ext") % 32
    ext, lang = _EXTS.get(e, (".py", "python"))
    return {
        "repo": f"org{i % 7}/repo{(i // 50) % 29}",
        "path": f"src/mod{(i // 10) % 97}/file_{i}{ext}",
        "commit": hashlib.sha256(f"commit:{i}".encode()).hexdigest()[:12],
        "lang": lang,
        "content": content_for(i),
    }


def sf_rows(sf: float) -> int:
    """SF=1.0 ≙ 100,000 files (BASELINE.md scale-factor definition)."""
    return int(round(sf * 100_000))


def gen_corpus_pandas(n_rows: int):
    """Driver/oracle-side generation (small SFs only)."""
    import pandas as pd

    return pd.DataFrame([gen_row(i) for i in range(n_rows)])


def gen_corpus_spark(spark, n_rows: int, partitions: int | None = None):
    """Distributed generation: spark.range → mapInPandas(gen_row).

    Row content is a pure function of the row index, so any partitioning
    of the id range yields the identical corpus — this is what makes the
    fixture safe to regenerate at any parallelism level.
    """
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame([gen_row(int(i)) for i in pdf["id"]])

    return spark.range(0, n_rows, 1, partitions).mapInPandas(gen, CORPUS_SCHEMA)


def write_corpus(spark, n_rows: int, path: str, fmt: str = "parquet") -> None:
    gen_corpus_spark(spark, n_rows).write.mode("overwrite").format(fmt).save(path)


def read_corpus(spark, path: str, fmt: str = "parquet"):
    """Source abstraction: Parquet in the sandbox, Iceberg on a real
    cluster (same schema; PySpark 4.1.2 here ships no Iceberg runtime jar
    and the sandbox has no network — SURVEY.md §7.5).

    Iceberg config for production:
      spark.sql.catalog.lake = org.apache.iceberg.spark.SparkCatalog
      read with spark.read.table("lake.db.corpus").
    """
    if fmt == "iceberg":
        return spark.read.table(path)
    return spark.read.format(fmt).load(path)


# ---------------------------------------------------------------------------
# The fixed reference query set (FIXTURES.md §2). The reference repo ships
# no query set, so this is the versioned one the rank-identity contract
# binds to. Rare-term queries are picked from the generated corpus.
# ---------------------------------------------------------------------------


def _first_rare_tags(n_docs: int, how_many: int = 2) -> list[str]:
    tags = []
    for i in range(n_docs):
        if has_rare(i):
            tags.append(f"uniq_{rare_tag(i)}")
            if len(tags) >= how_many:
                break
    return tags


def query_set(n_docs: int) -> list[tuple[int, str, int]]:
    """(query_id, text, k) — ~30 queries per FIXTURES.md §2."""
    rare = _first_rare_tags(n_docs, 2) or ["uniq_00000000"]
    qs: list[tuple[str, int]] = [
        # single hot term: epsilon-floored IDF, dense postings, salting
        ("def", 10),
        ("import", 10),
        ("the", 10),
        # single rare term: partition pruning, high IDF
        (rare[0], 10),
        (rare[-1], 5),
        # medium terms
        ("parse", 10),
        ("merge", 10),
        ("kw7", 10),
        ("kw42", 10),
        # multi-term mixed: OR semantics, per-term accumulation order
        ("parse token buffer", 10),
        ("def merge shard", 10),
        ("config buffer query", 10),
        ("the self return", 10),
        ("kw5 kw17 parse", 10),
        (f"def {rare[0]}", 10),
        # repeated query term: per-occurrence contribution
        ("index index index", 10),
        ("merge merge", 10),
        # OOV
        ("zzzznotaterm", 10),
        ("parse zzzznotaterm", 10),
        # tie bait → exact score ties → (score DESC, doc_id ASC)
        ("tiebait", 20),
        ("tiebait merge", 15),
        # stop-length tokens dropped (len<2 rule)
        ("a x parse", 10),
        ("i query o token", 10),
        # k sweep
        ("query merge", 1),
        ("query merge", 5),
        ("query merge", 10),
        ("query merge", 100),
        # broader mixes
        ("shard buffer", 10),
        ("import config kw100", 10),
        ("return token kw3 kw150", 25),
    ]
    return [(qid, text, k) for qid, (text, k) in enumerate(qs)]
