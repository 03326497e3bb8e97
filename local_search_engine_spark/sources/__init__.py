from .corpus import (  # noqa: F401
    CORPUS_SCHEMA,
    content_for,
    gen_corpus_pandas,
    gen_corpus_spark,
    gen_row,
    query_set,
    read_corpus,
    sf_rows,
    write_corpus,
)
