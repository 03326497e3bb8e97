"""Tokenizer parity: the three implementations (pure Python, built-in
expression, pandas UDF) must agree token-for-token (FIXTURES.md §4)."""

from local_search_engine_spark.functions.tokenize import (
    tokenize_expr,
    tokenize_py,
    tokenize_udf,
)
from local_search_engine_spark.sources.corpus import gen_corpus_pandas

GOLDEN = [
    ("def foo(bar): return bar+1", ["def", "foo", "bar", "return", "bar"]),
    ("Hello, WORLD!  x A bb", ["hello", "world", "bb"]),  # len<2 dropped
    ("ip os io a b z9", ["ip", "os", "io", "z9"]),  # preserve-list terms kept
    ("snake_case stays one_token", ["snake_case", "stays", "one_token"]),
    ("", []),
    ("\n\t  ,.;", []),
    ("uniq_deadbeef UNIQ_DEADBEEF", ["uniq_deadbeef", "uniq_deadbeef"]),
]


def test_golden_tokens():
    for text, want in GOLDEN:
        assert tokenize_py(text) == want, text


def test_expr_and_udf_match_python(spark):
    pdf = gen_corpus_pandas(40)
    pdf.loc[len(pdf)] = {
        "repo": "r",
        "path": "p",
        "commit": "c",
        "lang": "python",
        "content": "Hello ip A b2 __x__ foo.bar(baz);",
    }
    df = spark.createDataFrame(pdf)
    got = (
        df.select(
            "path",
            tokenize_expr(df.content).alias("t_expr"),
            tokenize_udf()(df.content).alias("t_udf"),
        )
        .orderBy("path")
        .collect()
    )
    want = {r["path"]: tokenize_py(r["content"]) for _, r in pdf.iterrows()}
    for row in got:
        assert list(row["t_expr"]) == want[row["path"]]
        assert list(row["t_udf"]) == want[row["path"]]
