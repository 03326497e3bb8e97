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


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def parse_png_header(payload: bytes) -> tuple[int, int]:
    """(width, height) from a PNG's IHDR chunk — dependency-free parse
    of the real container format (PNG spec: 8-byte signature, then the
    IHDR chunk whose first 8 data bytes are width/height, big-endian)."""
    import struct

    if payload[:8] != PNG_SIG or payload[12:16] != b"IHDR":
        raise ValueError("not a PNG (bad signature or first chunk not IHDR)")
    return struct.unpack(">II", payload[16:24])


def parse_wav_header(payload: bytes) -> tuple[int, int, int]:
    """(sample_rate, n_channels, n_samples) from a RIFF/WAVE file —
    dependency-free chunk walk (fmt then data; PCM block_align =
    channels * bytes_per_sample)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, channels, block_align, n_samples = 12, None, None, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            _, channels, rate, _, block_align, _ = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            if block_align is None:
                raise ValueError("WAV data chunk before fmt")
            n_samples = size // block_align
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if rate is None or n_samples is None:
        raise ValueError("WAV missing fmt or data chunk")
    return rate, channels, n_samples


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def build_png(width: int, height: int) -> bytes:
    """A complete, spec-valid 8-bit grayscale PNG (signature + IHDR +
    zlib IDAT of zero scanlines + IEND, CRCs included) — the test
    harness for decode_real; stdlib only."""
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = (b"\x00" + b"\x00" * width) * height  # filter byte + pixels per row
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def build_wav(rate: int, channels: int, n_samples: int) -> bytes:
    """A complete PCM16 RIFF/WAVE file of silence — stdlib only."""
    import struct

    data = b"\x00\x00" * n_samples * channels
    block_align = channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block_align, block_align, 16)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", 16)
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_jpeg_header(payload: bytes) -> tuple[int, int]:
    """(width, height) from a JPEG's SOF marker — dependency-free walk of
    the marker-segment stream (ITU T.81): after SOI, each segment is
    0xFF <marker> <2-byte big-endian length incl. itself>; any SOFn
    (0xC0-0xCF except DHT 0xC4 / JPG 0xC8 / DAC 0xCC) carries
    precision(1) height(2) width(2). Stops at SOS — a JPEG with no SOF
    before its scan data is malformed."""
    import struct

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker stream desynchronized")
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # standalone
            pos += 2
            continue
        (length,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            height, width = struct.unpack(">HH", payload[pos + 5 : pos + 9])
            return width, height
        if marker == 0xDA:  # SOS before any SOF
            break
        pos += 2 + length
    raise ValueError("JPEG has no SOF marker before scan data")


def build_jpeg(width: int, height: int) -> bytes:
    """A complete, DECODABLE baseline grayscale JPEG (ITU T.81): SOI,
    JFIF APP0, DQT (flat table), SOF0, two minimal custom DHTs (one
    1-bit code each — '0' -> DC category 0 / AC EOB; all-ones codes are
    reserved, '0' is legal), SOS, and real entropy data: every 8x8 MCU
    encodes DC-diff 0 + EOB = bits '00', padded with 1s. Any conformant
    decoder renders a uniform gray width x height image; stdlib only."""
    import struct

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    dqt = seg(0xDB, b"\x00" + bytes([16] * 64))
    sof0 = seg(0xC0, struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00")
    dht_dc = seg(0xC4, b"\x00" + bytes([1] + [0] * 15) + b"\x00")
    dht_ac = seg(0xC4, b"\x10" + bytes([1] + [0] * 15) + b"\x00")
    sos = seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")
    n_mcus = -(-height // 8) * -(-width // 8)
    nbits = 2 * n_mcus  # '00' per MCU
    nbytes = (nbits + 7) // 8
    # bit buffer of zeros, 1-padded to the byte boundary
    pad = nbytes * 8 - nbits
    data = bytearray(nbytes)
    if pad:
        data[-1] = (1 << pad) - 1
    # 0xFF byte-stuffing (cannot occur with this bit pattern; kept for
    # correctness if the MCU code ever changes)
    entropy = bytes(data).replace(b"\xff", b"\xff\x00")
    return (
        b"\xff\xd8" + app0 + dqt + sof0 + dht_dc + dht_ac + sos + entropy + b"\xff\xd9"
    )


_MP4_CONTAINERS = frozenset((b"moov", b"trak", b"mdia", b"minf", b"stbl"))


def _walk_mp4(payload: bytes, start: int, end: int, found: dict):
    """ISO BMFF box walk (ISO 14496-12): size(4, big-endian, includes
    header; 1 -> 64-bit largesize follows) + type(4); containers recurse."""
    import struct

    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body_at = pos + 8
        if size == 1:
            (size,) = struct.unpack(">Q", payload[pos + 8 : pos + 16])
            body_at = pos + 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError("mp4 box overruns its parent")
        if tag in _MP4_CONTAINERS:
            _walk_mp4(payload, body_at, pos + size, found)
        else:
            found.setdefault(tag, payload[body_at : pos + size])
        pos += size


def parse_mp4_header(payload: bytes) -> tuple[int, int, int]:
    """(width, height, n_frames) from an ISO BMFF (mp4/mov) file:
    width/height from tkhd's trailing 16.16 fixed-point fields,
    n_frames from stsz's sample_count. Box walk only — no codec
    payload is touched (frame PIXELS stay the documented seam)."""
    import struct

    if payload[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF file (no ftyp)")
    found: dict = {}
    _walk_mp4(payload, 0, len(payload), found)
    tkhd = found.get(b"tkhd")
    stsz = found.get(b"stsz")
    if tkhd is None or stsz is None:
        raise ValueError("mp4 missing tkhd or stsz box")
    off = 84 if tkhd[0] == 1 else 72  # version 1 widens three time fields
    wfx, hfx = struct.unpack(">II", tkhd[off + 4 : off + 12])
    (n_frames,) = struct.unpack(">I", stsz[8:12])
    return wfx >> 16, hfx >> 16, n_frames


def build_mp4(width: int, height: int, n_frames: int) -> bytes:
    """A structurally valid minimal ISO BMFF video file: ftyp + moov
    (mvhd, trak(tkhd, mdia(mdhd, hdlr, minf(stbl(stsd/stts/stsc/stsz/
    stco))))) + empty mdat. Every box has a correct size header; stsz
    uses a constant sample size so the table stays O(1). Stdlib only."""
    import struct

    def box(tag: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + tag + body

    def full(tag: bytes, version: int, body: bytes) -> bytes:
        return box(tag, bytes([version, 0, 0, 0]) + body)

    matrix = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    mvhd = full(
        b"mvhd",
        0,
        struct.pack(">IIII", 0, 0, 1000, n_frames * 40)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8
        + matrix
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    tkhd = full(
        b"tkhd",
        0,
        struct.pack(">IIIII", 0, 0, 1, 0, n_frames * 40)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + matrix
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = full(b"mdhd", 0, struct.pack(">IIIIHH", 0, 0, 25, n_frames, 0x55C4, 0))
    hdlr = full(b"hdlr", 0, struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"\x00")
    stsd = full(b"stsd", 0, struct.pack(">I", 0))
    stts = full(b"stts", 0, struct.pack(">III", 1, n_frames, 1))
    stsc = full(b"stsc", 0, struct.pack(">I", 0))
    stsz = full(b"stsz", 0, struct.pack(">II", 1, n_frames))
    stco = full(b"stco", 0, struct.pack(">I", 0))
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    mdat = box(b"mdat", b"")
    return ftyp + moov + mdat


def decode_real(payload: bytes, media_type: str) -> tuple[int, int, int]:
    """Real container decode, dispatched by MAGIC BYTES (not the label):

      PNG  -> (width, height, 1)
      JPEG -> (width, height, 1)
      WAVE -> (sample_rate, n_channels, n_samples)   [audio semantics:
               width := sample rate, height := channels, n_frames :=
               samples — the same typed-meta columns, documented here]
      mp4  -> (width, height, n_frames)              [ISO BMFF box walk]

    Container METADATA is parsed natively for all four; decoding frame
    PIXELS / audio SAMPLES beyond the container level remains the
    production seam: wire PIL / pyav here on a cluster that has them."""
    if payload[:8] == PNG_SIG:
        w, h = parse_png_header(payload)
        return (w, h, 1)
    if payload[:2] == b"\xff\xd8":
        w, h = parse_jpeg_header(payload)
        return (w, h, 1)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        rate, channels, n_samples = parse_wav_header(payload)
        return (rate, channels, n_samples)
    if payload[4:8] == b"ftyp":
        return parse_mp4_header(payload)
    raise NotImplementedError(
        "codec for this container requires media libraries not present in "
        "this environment; wire PIL/ffmpeg here (PNG/JPEG/WAV/mp4 container "
        "metadata decodes natively)"
    )


def synthesize_real_media(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Deterministic REAL media bytes from a text table, cycling the four
    natively-parsed containers by doc_id % 4 (0 png, 1 wav, 2 jpeg,
    3 mp4), with container parameters derived from the md5(text) digest
    bytes (b = digest):

      png:  width = 1 + b[0] % 64, height = 1 + b[1] % 64
      wav:  rate = 8000 + 100 * (b[0] % 8), channels = 1 + b[1] % 2,
            n_samples = 1 + b[2] % 16
      jpeg: width = 1 + b[0] % 64, height = 1 + b[1] % 64
      mp4:  width = 16 * (1 + b[0] % 64), height = 16 * (1 + b[1] % 64),
            n_frames = 1 + b[2] % 16

    An SQL oracle replicates the PARAMETERS from md5(text) directly, so
    decode_real's round-trip through genuine binary containers is
    hash-checkable. Arrow-batched mapInPandas (bytes are built
    row-locally, no shuffle)."""

    def batches(it):
        import hashlib

        import pandas as pd

        for pdf in it:
            ids, types, payloads = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                b = hashlib.md5((text or "").encode("utf-8")).digest()
                kind = int(did) % 4
                if kind == 0:
                    types.append("png")
                    payloads.append(build_png(1 + b[0] % 64, 1 + b[1] % 64))
                elif kind == 1:
                    types.append("wav")
                    payloads.append(
                        build_wav(8000 + 100 * (b[0] % 8), 1 + b[1] % 2, 1 + b[2] % 16)
                    )
                elif kind == 2:
                    types.append("jpeg")
                    payloads.append(build_jpeg(1 + b[0] % 64, 1 + b[1] % 64))
                else:
                    types.append("mp4")
                    payloads.append(
                        build_mp4(
                            16 * (1 + b[0] % 64), 16 * (1 + b[1] % 64), 1 + b[2] % 16
                        )
                    )
                ids.append(int(did))
            yield pd.DataFrame(
                {"id": ids, "media_type": types, "payload": payloads}
            )

    from ..plans.layout import widen_for_kernel

    return widen_for_kernel(docs.select(id_col, text_col)).mapInPandas(
        batches, "id long, media_type string, payload binary"
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

    from ..plans.layout import widen_for_kernel

    return widen_for_kernel(media).mapInPandas(batches, MEDIA_SCHEMA)


def synthesize_pdf_media(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Deterministic REAL PDF bytes from a text table: each row becomes a
    complete single-page PDF 1.4 (xref, page tree, Flate content stream)
    embedding the row's text verbatim — the test/gate harness for
    pdf_extract. Arrow-batched mapInPandas; bytes built row-locally, no
    shuffle."""

    def batches(it):
        import pandas as pd

        from local_search_engine_spark.functions.pdftext import build_pdf

        for pdf in it:
            yield pd.DataFrame(
                {
                    "id": [int(d) for d in pdf[id_col]],
                    "payload": [
                        build_pdf([t or ""]) for t in pdf[text_col]
                    ],
                }
            )

    from ..plans.layout import widen_for_kernel

    return widen_for_kernel(docs.select(id_col, text_col)).mapInPandas(
        batches, "id long, payload binary"
    )


PDF_TEXT_SCHEMA = "id long, text string, n_pages int, extract_ok boolean"


def pdf_extract(media, payload_col: str = "payload", id_col: str = "id"):
    """PDF binary → extracted text, the reference's PyPDF2 ingest
    (reference preprocessing.py:335-345) re-expressed as an Arrow-batched
    mapInPandas over a binary column: per-page text, pages joined with a
    single space (byte-parity with the reference's join), dependency-free
    parser (functions/pdftext.py). Narrow op — partitioning preserved, no
    shuffle; extract_ok=False flags pages outside the raw/FlateDecode
    subset instead of failing silently."""

    def batches(it):
        import pandas as pd

        from local_search_engine_spark.functions.pdftext import extract_pdf_text

        for pdf in it:
            texts, pages, oks = [], [], []
            for payload in pdf[payload_col]:
                try:
                    text, n_pages, ok = extract_pdf_text(bytes(payload))
                except Exception:
                    text, n_pages, ok = "", 0, False
                texts.append(text)
                pages.append(n_pages)
                oks.append(ok)
            yield pd.DataFrame(
                {
                    "id": [int(d) for d in pdf[id_col]],
                    "text": texts,
                    "n_pages": pd.Series(pages, dtype="int32"),
                    "extract_ok": oks,
                }
            )

    from ..plans.layout import widen_for_kernel

    return widen_for_kernel(media.select(id_col, payload_col)).mapInPandas(
        batches, PDF_TEXT_SCHEMA
    )


def pdf_to_text(
    df,
    payload_col: str = "payload",
    out_col: str = "content",
    pages_col: str = "n_pages",
    ok_col: str = "extract_ok",
):
    """All-columns-through PDF ingest: appends (out_col, pages_col,
    ok_col) to EVERY input column in one narrow mapInPandas pass — no id
    synthesis, no self-join, partitioning preserved. This is the shape a
    corpus keyed by (repo, path, commit) needs: pdf_extract is the
    id-keyed gate harness; this is the production ingest step
    (scripts/build_index.py --pdf-col). The payload column is dropped
    from the output (the decoded text replaces it; re-select upstream to
    keep the bytes)."""
    import pyspark.sql.types as T

    for c in (out_col, pages_col, ok_col):
        if c in df.columns:
            raise ValueError(f"output column {c!r} already exists in the input")
    kept = [f for f in df.schema.fields if f.name != payload_col]
    schema = T.StructType(
        kept
        + [
            T.StructField(out_col, T.StringType()),
            T.StructField(pages_col, T.IntegerType()),
            T.StructField(ok_col, T.BooleanType()),
        ]
    )
    kept_names = [f.name for f in kept]

    def batches(it):
        import pandas as pd

        from local_search_engine_spark.functions.pdftext import extract_pdf_text

        for pdf in it:
            texts, pages, oks = [], [], []
            for payload in pdf[payload_col]:
                try:
                    text, n_pages, ok = extract_pdf_text(bytes(payload))
                except Exception:
                    text, n_pages, ok = "", 0, False
                texts.append(text)
                pages.append(n_pages)
                oks.append(ok)
            out = pdf[kept_names].copy()
            out[out_col] = texts
            out[pages_col] = pd.Series(pages, dtype="int32")
            out[ok_col] = oks
            yield out

    from ..plans.layout import widen_for_kernel

    return widen_for_kernel(df).mapInPandas(batches, schema)


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
