"""PDF text extraction seam: dependency-free builder/extractor round-trip
(functions/pdftext.py) and the Spark mapInPandas path
(operators/multimodal.py synthesize_pdf_media → pdf_extract).

Closes the last reference source modality: reference
preprocessing.py:335-345 reads PDFs with PyPDF2 (per-page
extract_text(), pages joined with ' '). The engine reproduces that
contract with stdlib-only parsing so the ingest path needs no extra
packages on a cluster."""

from __future__ import annotations

import zlib

import pytest

from local_search_engine_spark.functions.pdftext import (
    build_pdf,
    extract_pdf_text,
)
from local_search_engine_spark.operators.multimodal import (
    pdf_extract,
    pdf_to_text,
    synthesize_pdf_media,
)

# ------------------------------------------------------------- pure python


@pytest.mark.parametrize(
    "pages",
    [
        ["hello world"],
        ["multi\nline\ntext", "second page"],
        ["specials () \\ parens", "tabs\there"],
        [""],
        ["", "", "x"],
        ["unicode: café — 中文 🙂"],
        ["trailing newline\n"],
        ["\nleading newline"],
        ["a" * 5000],  # forces a multi-KB Flate stream
    ],
)
def test_roundtrip_exact(pages):
    text, n_pages, ok = extract_pdf_text(build_pdf(pages))
    assert ok
    assert n_pages == len(pages)
    # byte-parity with the reference's ' '.join(page.extract_text())
    assert text == " ".join(pages)


def test_roundtrip_uncompressed():
    text, n_pages, ok = extract_pdf_text(build_pdf(["raw stream"], compress=False))
    assert (text, n_pages, ok) == ("raw stream", 1, True)


def test_hex_strings_and_tj_array():
    # handcrafted content stream: TJ array with kerning numbers (dropped)
    # and a hex string with embedded whitespace
    content = b"BT [(ab) -120 (cd)] TJ T* <4 86 9> Tj ET"
    pdf = _wrap_single_stream(content)
    text, n_pages, ok = extract_pdf_text(pdf)
    assert ok and n_pages == 1
    assert text == "abcd\nHi"  # <48 69> = 'Hi'; trailing nibble pads with 0


def test_quote_operators_emit_newline():
    # ' (move to next line and show) inserts a newline between showings
    content = b"BT (first) Tj (second) ' ET"
    text, _, ok = extract_pdf_text(_wrap_single_stream(content))
    assert ok and text == "first\nsecond"


def test_octal_and_line_continuation_escapes():
    content = b"BT (oct\\101al) Tj ET"  # \101 = 'A'
    text, _, ok = extract_pdf_text(_wrap_single_stream(content))
    assert ok and text == "octAal"
    content = b"BT (split\\\nword) Tj ET"  # backslash-newline = continuation
    text, _, ok = extract_pdf_text(_wrap_single_stream(content))
    assert ok and text == "splitword"


def test_utf16be_bom_string():
    raw = "café".encode("utf-16-be")
    content = b"BT (" + b"\xfe\xff" + raw + b") Tj ET"
    # raw bytes contain no parens/backslash here, safe to embed literally
    text, _, ok = extract_pdf_text(_wrap_single_stream(content))
    assert ok and text == "café"


def test_unsupported_filter_is_flagged_not_silent():
    pdf = bytearray(build_pdf(["visible page"]))
    # graft a second page whose content stream claims DCTDecode
    bad = (
        b"10 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 11 0 R >>\nendobj\n"
        b"11 0 obj\n<< /Length 4 /Filter /DCTDecode >>\nstream\n\xff\xd8\xff\xe0\nendstream\nendobj\n"
    )
    grafted = bytes(pdf).replace(
        b"/Kids [4 0 R] /Count 1", b"/Kids [4 0 R 10 0 R] /Count 2"
    ) + bad
    text, n_pages, ok = extract_pdf_text(grafted)
    assert n_pages == 2  # page still counted
    assert not ok  # seam observable, not silent
    assert text.startswith("visible page")


def test_corrupt_flate_flagged():
    pdf = build_pdf(["good text"])
    # corrupt the Flate payload: flip bytes inside the stream body
    at = pdf.find(b"stream\n", pdf.find(b"/FlateDecode")) + len(b"stream\n")
    broken = pdf[:at] + b"\x00\x00\x00\x00" + pdf[at + 4 :]
    text, n_pages, ok = extract_pdf_text(broken)
    assert n_pages == 1 and not ok and text == ""


def test_contents_array_and_indirect_length():
    # /Contents as an array of two streams; /Length via indirect ref
    c1 = b"BT (part one ) Tj ET"
    c2 = b"BT (part two) Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >>\nendobj\n"
        b"4 0 obj\n<< /Length 6 0 R >>\nstream\n" + c1 + b"\nendstream\nendobj\n"
        b"5 0 obj\n<< /Length " + str(len(c2)).encode() + b" >>\nstream\n"
        + c2 + b"\nendstream\nendobj\n"
        b"6 0 obj\n" + str(len(c1)).encode() + b"\nendobj\n"
        b"trailer\n<< /Size 7 /Root 1 0 R >>\n%%EOF\n"
    )
    text, n_pages, ok = extract_pdf_text(pdf)
    assert ok and n_pages == 1 and text == "part one part two"


def test_nested_pages_tree_document_order():
    # root /Pages → [leaf Pages node, direct Page]; order must follow the
    # tree, not object numbering (page 9 before page 4)
    def page(num, cnum, txt):
        content = b"BT (" + txt + b") Tj ET"
        return (
            f"{num} 0 obj\n<< /Type /Page /Parent 2 0 R /Contents {cnum} 0 R >>\nendobj\n".encode()
            + f"{cnum} 0 obj\n<< /Length {len(content)} >>\nstream\n".encode()
            + content
            + b"\nendstream\nendobj\n"
        )

    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Pages /Parent 2 0 R /Kids [9 0 R] /Count 1 >>\nendobj\n"
        + page(9, 10, b"nested first")
        + page(4, 5, b"direct second")
        + b"trailer\n<< /Size 11 /Root 1 0 R >>\n%%EOF\n"
    )
    text, n_pages, ok = extract_pdf_text(pdf)
    assert ok and n_pages == 2
    assert text == "nested first direct second"


def test_garbage_input_degrades_gracefully():
    # objectless junk is flagged extract_ok=False (r05) so --pdf-col
    # callers skip it instead of indexing an empty document
    for junk in (b"", b"not a pdf at all", b"%PDF-1.4\ngarbage\n%%EOF"):
        text, n_pages, ok = extract_pdf_text(junk)
        assert text == "" and n_pages == 0 and not ok
    # a GENUINE zero-page PDF stays ok=True
    text, n_pages, ok = extract_pdf_text(build_pdf([]))
    assert text == "" and n_pages == 0 and ok


def _wrap_single_stream(content: bytes) -> bytes:
    """Minimal valid one-page PDF around a raw content stream —
    independent of build_pdf so builder and extractor cannot share a
    bug for the operator-level tests."""
    compressed = zlib.compress(content)
    return (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(compressed)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + compressed + b"\nendstream\nendobj\n"
        b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n"
    )


# ------------------------------------------------------------------ spark


def test_spark_pdf_roundtrip(spark):
    rows = [
        (0, "plain text doc"),
        (1, "multi\nline\ncontent with (parens) and \\ slash"),
        (2, ""),
        (3, None),
        (4, "unicode café — 中文"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    media = synthesize_pdf_media(docs, text_col="text", id_col="doc_id")
    out = pdf_extract(media).orderBy("id").collect()
    assert [r["id"] for r in out] == [0, 1, 2, 3, 4]
    assert all(r["extract_ok"] for r in out)
    assert all(r["n_pages"] == 1 for r in out)
    expected = {i: (t or "") for i, t in rows}
    for r in out:
        assert r["text"] == expected[r["id"]]


def test_spark_pdf_plan_is_narrow(spark):
    """Both stages are mapInPandas over the scan — no exchange."""
    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    plan = pdf_extract(
        synthesize_pdf_media(docs)
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pdf_to_text_all_columns_through(spark):
    """Production ingest shape: every input column rides through the
    narrow decode; payload is replaced by the decoded text; codec-seam
    rows are flagged, not dropped or blanked silently."""
    from local_search_engine_spark.functions.pdftext import build_pdf

    rows = [
        ("r1", "a/b.py", "c0", "py", build_pdf(["def f(): pass"])),
        ("r1", "a/c.py", "c0", "py", build_pdf(["page one", "page two"])),
        ("r2", "x.txt", "c1", "txt", b"not a pdf"),
    ]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, payload binary"
    )
    out = pdf_to_text(corpus, payload_col="payload").orderBy("path").collect()
    assert [r["path"] for r in out] == ["a/b.py", "a/c.py", "x.txt"]
    assert out[0]["content"] == "def f(): pass" and out[0]["extract_ok"]
    assert out[1]["content"] == "page one page two" and out[1]["n_pages"] == 2
    assert out[2]["content"] == "" and out[2]["n_pages"] == 0
    # all original non-payload columns present, payload gone
    assert set(out[0].asDict()) == {
        "repo", "path", "commit", "lang", "content", "n_pages", "extract_ok",
    }
    # collision guard
    with pytest.raises(ValueError):
        pdf_to_text(corpus.withColumnRenamed("lang", "content"))


def test_pdf_corpus_indexes_end_to_end(spark, tmp_path):
    """The --pdf-col ingest composition (scripts/build_index.py): PDF
    corpus -> pdf_to_text -> persisted index -> WAND query finds the
    document by a term that exists only inside the PDF binary."""
    from local_search_engine_spark.functions.pdftext import build_pdf
    from local_search_engine_spark.plans.checkpoint import (
        build_persisted_index,
        load_index,
    )

    rows = [
        ("r", f"f{i}.py", "c0", "py", build_pdf([f"module {i}\ndef handler_{i}(): return {i}"]))
        for i in range(30)
    ]
    rows.append(("r", "needle.py", "c0", "py", build_pdf(["def zanzibar_needle(): pass"])))
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, payload binary"
    )
    decoded = pdf_to_text(corpus, payload_col="payload", out_col="content")
    assert decoded.filter("NOT extract_ok").count() == 0
    idx_dir = str(tmp_path / "pdf_index")
    build_persisted_index(
        spark,
        decoded.drop("n_pages", "extract_ok"),
        idx_dir,
        docs_per_shard=16,
        n_buckets=4,
        n_groups=2,
    )
    from local_search_engine_spark.operators.wand import make_wand_topk

    idx, postings, shard_meta, stats = load_index(spark, idx_dir)
    wand = make_wand_topk(idx, postings, shard_meta)
    hits = wand("zanzibar_needle", 5).collect()
    assert len(hits) == 1


def test_indirect_length_resolved_via_xref_despite_poison_stream():
    """r05 (ADVICE): a binary stream whose BYTES look like
    '6 0 obj 3 endobj' must not poison indirect-/Length resolution.
    The file carries a classic xref table whose offsets point at the
    REAL object 6; the old whole-file regex would have matched the
    poison (later match wins) and truncated the content stream to 3
    bytes. With xref-first resolution the full text extracts."""
    c1 = b"BT (hello xref world) Tj ET"
    poison = b"XX 6 0 obj 3 endobj YY"  # lives INSIDE a stream body
    body: dict[int, bytes] = {}
    body[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    body[2] = b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
    body[3] = b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"
    body[4] = b"<< /Length 6 0 R >>\nstream\n" + c1 + b"\nendstream"
    body[5] = (
        b"<< /Length " + str(len(poison)).encode() + b" >>\nstream\n"
        + poison + b"\nendstream"
    )
    body[6] = str(len(c1)).encode()
    buf = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(body):
        offsets[num] = len(buf)
        buf += f"{num} 0 obj\n".encode() + body[num] + b"\nendobj\n"
    xref_at = len(buf)
    buf += b"xref\n0 7\n" + b"0000000000 65535 f \n"
    for num in range(1, 7):
        buf += f"{offsets[num]:010d} 00000 n \n".encode()
    buf += (
        b"trailer\n<< /Size 7 /Root 1 0 R >>\n"
        + f"startxref\n{xref_at}\n%%EOF\n".encode()
    )
    text, n_pages, ok = extract_pdf_text(bytes(buf))
    assert ok and n_pages == 1 and text == "hello xref world", (ok, n_pages, text)

    # the regex fallback must still work when the xref is absent: strip
    # the table (and the poison object, which would defeat the regex)
    nox: dict[int, bytes] = {k: v for k, v in body.items() if k != 5}
    buf2 = bytearray(b"%PDF-1.4\n")
    for num in sorted(nox):
        buf2 += f"{num} 0 obj\n".encode() + nox[num] + b"\nendobj\n"
    buf2 += b"trailer\n<< /Size 7 /Root 1 0 R >>\n%%EOF\n"
    text2, n2, ok2 = extract_pdf_text(bytes(buf2))
    assert ok2 and n2 == 1 and text2 == "hello xref world"
