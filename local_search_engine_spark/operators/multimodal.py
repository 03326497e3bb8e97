"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The reference's nearest analogue is its PDF scan (reference
preprocessing.py:335-345 — a binary format decoded to text); this module
generalizes to the shape a 100 TB training-data pipeline needs:

  media table: (id long, media_type string, payload binary,
                meta struct<width int, height int, n_frames int>)

The Spark-side plumbing — schema, batch iteration, partitioning, UDF
signature — is REAL and tested. The actual codec decode is STUBBED
(this container has no image/audio libraries): `decode_stub` derives
deterministic pseudo-metadata from the payload bytes, and
`decode_real` raises NotImplementedError with the intended signature,
marking exactly where PIL/ffmpeg decoding plugs in on a real cluster.
"""

from __future__ import annotations

MEDIA_SCHEMA = (
    "id long, media_type string, payload binary, "
    "width int, height int, n_frames int, size_bytes long"
)


def synthesize_media(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Deterministic fake media rows from a text table (test harness for
    the plumbing): payload = md5 digest bytes of the text; media_type
    cycles by id. Pure built-in expressions."""
    from pyspark.sql import functions as F

    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col(id_col).alias("id"),
        mt.alias("media_type"),
        F.unhex(F.md5(F.col(text_col))).alias("payload"),
    )


def decode_real(payload: bytes, media_type: str):
    """The real-decoder seam. On a production cluster this dispatches to
    PIL / soundfile / pyav per media_type inside extract_metadata's
    batch loop. Deliberately unimplemented in this sandbox."""
    raise NotImplementedError(
        "media codec decode requires image/audio libraries not present in "
        "this environment; wire PIL/ffmpeg here and pass decoder=decode_real"
    )


def _stub_meta(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: metadata from digest bytes. Matches the
    SQL oracle in __spark_entry__.py byte-for-byte:
      width    = 1 + (payload[0]  as uint)  % 64
      height   = 1 + (payload[1]  as uint)  % 64
      n_frames = 1 + (payload[2]  as uint)  % 16
    """
    return (1 + payload[0] % 64, 1 + payload[1] % 64, 1 + payload[2] % 16)


def extract_metadata(media, decoder=None):
    """mapInPandas over media rows → typed metadata columns.

    Arrow-batched: each pandas batch is decoded in one pass; partitioning
    is preserved (narrow op, no shuffle). `decoder(payload, media_type)
    -> (width, height, n_frames)` defaults to the deterministic stub.
    """
    import pandas as pd

    dec = decoder or (lambda p, m: _stub_meta(p))

    def batches(it):
        for pdf in it:
            metas = [dec(bytes(p), m) for p, m in zip(pdf["payload"], pdf["media_type"])]
            out = pdf[["id", "media_type", "payload"]].copy()
            out["width"] = pd.Series([m[0] for m in metas], dtype="int32").values
            out["height"] = pd.Series([m[1] for m in metas], dtype="int32").values
            out["n_frames"] = pd.Series([m[2] for m in metas], dtype="int32").values
            out["size_bytes"] = pd.Series([len(bytes(p)) for p in pdf["payload"]], dtype="int64").values
            yield out

    return media.mapInPandas(batches, MEDIA_SCHEMA)


def frame_sample(media_meta, every_n: int = 4):
    """Frame-sampling plumbing: one row per sampled frame index —
    posexplode over a sequence bounded by n_frames. The per-frame pixel
    fetch is the decode_real seam; here the frame row carries (id,
    frame_idx) which is the real partition/join key shape at scale."""
    from pyspark.sql import functions as F

    idx = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
    return media_meta.select(
        "id", "media_type", F.explode(idx).alias("frame_idx")
    )
