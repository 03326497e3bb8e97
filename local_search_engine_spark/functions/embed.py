"""Embedding generation — the W2 worker seam (reference
preprocessing.py:85-127: SentenceTransformer encode over chunk batches).

The engine treats embedding *scoring* as data-parallel algebra
(operators/similarity.py); this module is the missing *generation* seam:
a mapInPandas operator that turns a text column into an
`array<double>` embedding column, so a user with only a text corpus can
run the dense / hybrid retrieval path end-to-end.

The seam takes an ``encoder_factory`` — a zero-arg callable run ONCE PER
PYTHON WORKER that returns ``encode(texts: list[str]) -> ndarray[n, dim]``.
That is the standard Spark pattern for heavyweight models: the factory
closure ships to executors, the model loads lazily outside the per-batch
loop, and Arrow batches stream through it. The default factory is
``stub_encoder_factory`` — a deterministic md5-derived pseudo-encoder
(sandbox has no model libs; same honest-stub pattern as
operators/multimodal.decode_real): component d of a text's vector is

    h32(md5(text) || ':' || d) / 2^31 - 1        (a value in [-1, 1))

which a SQL oracle reproduces exactly, making the whole generation path
driver-gate checkable.
"""

from __future__ import annotations

DEFAULT_DIM = 64


def stub_encoder_factory(dim: int = DEFAULT_DIM):
    """Deterministic stand-in encoder: reproducible in SQL, stable across
    partitionings (a pure function of the text alone)."""
    import hashlib

    import numpy as np

    # per-component suffixes precomputed once per encoder; md5 state of
    # the shared "<hexdigest>:" prefix is hashed once per text and
    # .copy()'d per component — bit-identical to md5(f"{key}:{d}")
    # (md5 is a pure stream hash), int.from_bytes(digest[:4]) is the
    # first 8 hex chars, and h * 2^-31 == h / 2^31 exactly (power-of-two
    # scale). Same floats, ~2x fewer Python-level hash round-trips.
    suffixes = [str(d).encode("ascii") for d in range(dim)]
    scale = 1.0 / 2147483648.0

    def encode(texts):
        out = np.empty((len(texts), dim), dtype=np.float64)
        for i, t in enumerate(texts):
            key = hashlib.md5(t.encode("utf-8")).hexdigest()
            base = hashlib.md5((key + ":").encode("ascii"))
            row = out[i]
            for d in range(dim):
                m = base.copy()
                m.update(suffixes[d])
                row[d] = int.from_bytes(m.digest()[:4], "big") * scale - 1.0
        return out

    return encode


def embed_docs(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = DEFAULT_DIM,
    encoder_factory=None,
    out_col: str = "embedding",
):
    """(id_col, embedding array<double>) via Arrow-batched mapInPandas.

    encoder_factory() runs once per worker (model load); encode() is
    called once per Arrow batch — batch size is governed by
    spark.sql.execution.arrow.maxRecordsPerBatch, so memory per task is
    bounded regardless of partition size. Embarrassingly parallel: no
    shuffle, scales linearly with executors at 100 TB.
    """
    factory = encoder_factory or (lambda: stub_encoder_factory(dim))

    def gen(batches):
        import pandas as pd

        encode = factory()  # once per worker/task, NOT per batch
        for pdf in batches:
            vecs = encode(pdf[text_col].tolist())
            if vecs.shape[1] != dim:
                raise ValueError(
                    f"encoder returned dim {vecs.shape[1]}, expected {dim}"
                )
            yield pd.DataFrame(
                {id_col: pdf[id_col], out_col: list(map(list, vecs))}
            )

    from ..plans.layout import widen_for_kernel

    return widen_for_kernel(docs.select(id_col, text_col)).mapInPandas(
        gen, f"{id_col} long, {out_col} array<double>"
    )
