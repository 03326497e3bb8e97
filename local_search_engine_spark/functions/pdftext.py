"""Dependency-free PDF text extraction (and a spec-valid builder).

Closes the one reference source modality the engine had not reproduced:
the reference ingests PDFs via PyPDF2 (reference preprocessing.py:335-345
— `PdfReader(file)`, per-page `extract_text()`, pages joined with a
single space). This module re-implements that contract for the common
PDF subset with the stdlib only (re + zlib), so the Spark ingest path
can decode real PDF binaries on a cluster with no extra packages:

  supported: classic xref PDFs; content streams raw or /FlateDecode;
             text via Tj / ' / " / TJ with literal and hex strings;
             line moves Td/TD/T*/Tm rendered as newlines BETWEEN
             showings; /Contents as one ref or an array; /Length direct
             or as an indirect reference; nested /Pages trees; UTF-8 or
             UTF-16BE (BOM) string bytes.
  documented seam (extract_ok=False, page still counted): encrypted
             PDFs, non-Flate filters (DCT/LZW/ObjStm/cross-ref streams),
             CID/CMap-remapped fonts. These need a real PDF stack; the
             per-row `extract_ok` flag makes the gap observable instead
             of silent.

Page texts are joined with a single space — byte-parity with the
reference's `' '.join(page.extract_text() ...)`.

`build_pdf` writes a complete, spec-valid PDF 1.4 (catalog, page tree,
per-page Flate content streams, xref table with correct offsets) and is
the deterministic test harness: `extract_pdf_text(build_pdf([t]))[0]
== t` exactly, which is how the driver gate pins content-sha256
equality through a genuine binary round-trip.
"""

from __future__ import annotations

import re
import zlib

# ---------------------------------------------------------------- builder


def _escape_pdf_string(raw: bytes) -> bytes:
    # chained C-level replaces (backslash FIRST so later escapes aren't
    # double-escaped) — byte-identical to the per-byte table walk it
    # replaces, without a Python-level loop per byte
    return (
        raw.replace(b"\\", b"\\\\")
        .replace(b"(", b"\\(")
        .replace(b")", b"\\)")
        .replace(b"\n", b"\\n")
        .replace(b"\r", b"\\r")
        .replace(b"\t", b"\\t")
        .replace(b"\x08", b"\\b")
        .replace(b"\x0c", b"\\f")
    )


def _page_content(page_text: str) -> bytes:
    """One content stream: one Tj per line, T* between lines, so the
    extractor's newline-between-showings rule reconstructs the original
    text exactly (including empty lines and a trailing newline)."""
    lines = page_text.split("\n")
    shows = b" T*\n".join(
        b"(" + _escape_pdf_string(line.encode("utf-8")) + b") Tj"
        for line in lines
    )
    return b"BT /F1 12 Tf 12 TL 72 720 Td\n" + shows + b"\nET"


def build_pdf(pages: list[str], compress: bool = True) -> bytes:
    """A complete, spec-valid PDF 1.4 with one content stream per page.

    Object layout: 1 catalog, 2 pages tree, 3 font, then per page i:
    (4+2i) page node, (5+2i) content stream (FlateDecode when
    `compress`). The xref table carries real byte offsets; stdlib only.
    """
    objs: dict[int, bytes] = {}
    n = len(pages)
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode()
    )
    objs[3] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    for i, page in enumerate(pages):
        content = _page_content(page)
        filt = b""
        if compress:
            content = zlib.compress(content)
            filt = b" /Filter /FlateDecode"
        objs[4 + 2 * i] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {5 + 2 * i} 0 R >>".encode()
        )
        objs[5 + 2 * i] = (
            b"<< /Length " + str(len(content)).encode() + filt + b" >>\n"
            b"stream\n" + content + b"\nendstream"
        )
    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(buf)
        buf += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_at = len(buf)
    total = max(objs) + 1
    buf += f"xref\n0 {total}\n".encode() + b"0000000000 65535 f \n"
    for num in range(1, total):
        buf += f"{offsets[num]:010d} 00000 n \n".encode()
    buf += (
        f"trailer\n<< /Size {total} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n".encode()
    )
    return bytes(buf)


# --------------------------------------------------------------- extractor

_OBJ_HEAD = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


def _xref_numeric_resolver(payload: bytes):
    """Resolve numeric objects via the classic xref table: follow the
    LAST `startxref`, parse the subsection offsets, and read the target
    object at its declared byte offset. Unlike a whole-file regex this
    cannot be poisoned by stream bytes that merely LOOK like
    'N 0 obj M endobj' (r05, ADVICE) — an offset is authoritative.
    Returns a resolve(obj_num) -> int|None callable, or None when the
    file has no parseable classic xref (linearized/1.5 xref streams
    fall back to the regex map)."""
    sx = payload.rfind(b"startxref")
    if sx == -1:
        return None
    m = re.match(rb"startxref\s+(\d+)", payload[sx : sx + 40])
    if not m:
        return None
    at = int(m.group(1))
    if at < 0 or at >= len(payload) or not payload.startswith(b"xref", at):
        return None
    pos = at + 4
    offsets: dict[int, int] = {}
    while True:
        sub = re.match(rb"\s*(\d+)\s+(\d+)\s+", payload[pos : pos + 64])
        if not sub:
            break
        start, count = int(sub.group(1)), int(sub.group(2))
        pos += sub.end()
        for i in range(count):
            ent = re.match(rb"(\d{10})\s+(\d{5})\s+([nf])\s{0,2}", payload[pos : pos + 24])
            if not ent:
                return None
            if ent.group(3) == b"n":
                offsets[start + i] = int(ent.group(1))
            pos += ent.end()
    if not offsets:
        return None

    def resolve(num: int):
        off = offsets.get(num)
        if off is None or off >= len(payload):
            return None
        mm = re.match(rb"(\d+)\s+\d+\s+obj\s+(\d+)\s*endobj", payload[off : off + 64])
        if mm and int(mm.group(1)) == num:
            return int(mm.group(2))
        return None

    return resolve


def _scan_objects(payload: bytes):
    """Sequential scan → {obj_num: (dict_bytes, stream_bytes|None)}.

    Stream data is sliced by the declared /Length — direct, or an
    indirect ref resolved FIRST against the xref table (authoritative
    byte offsets, immune to stream-content lookalikes) and only then
    against a whole-file numeric-object regex (xref-less fallback) —
    so binary stream bytes can never be misread as object boundaries;
    if /Length is unresolvable, falls back to the first `endstream`
    (documented approximation)."""
    xref_resolve = _xref_numeric_resolver(payload)
    # regex fallback map, built lazily: only needed when the file has
    # no usable xref (and then only for indirect-length streams)
    numerics_cache: list[dict | None] = [None]

    def regex_numeric(num: int):
        if numerics_cache[0] is None:
            numerics_cache[0] = {
                int(m.group(1)): int(m.group(2))
                for m in re.finditer(rb"(\d+)\s+\d+\s+obj\s+(\d+)\s+endobj", payload)
            }
        return numerics_cache[0].get(num)
    objs: dict[int, tuple[bytes, bytes | None]] = {}
    pos = 0
    while True:
        m = _OBJ_HEAD.search(payload, pos)
        if not m:
            break
        num, body_at = int(m.group(1)), m.end()
        end_obj = payload.find(b"endobj", body_at)
        stream_at = payload.find(b"stream", body_at)
        if stream_at != -1 and (end_obj == -1 or stream_at < end_obj):
            head = payload[body_at:stream_at]
            data_at = stream_at + len(b"stream")
            if payload[data_at : data_at + 2] == b"\r\n":
                data_at += 2
            elif payload[data_at : data_at + 1] in (b"\n", b"\r"):
                data_at += 1
            lm = re.search(rb"/Length\s+(\d+)(\s+\d+\s+R)?", head)
            length = None
            if lm:
                if lm.group(2):  # indirect ref: xref first, regex fallback
                    ref = int(lm.group(1))
                    length = xref_resolve(ref) if xref_resolve else None
                    if length is None:
                        length = regex_numeric(ref)
                else:
                    length = int(lm.group(1))
            if length is None:
                data_end = payload.find(b"endstream", data_at)
                length = (data_end if data_end != -1 else len(payload)) - data_at
            data = payload[data_at : data_at + length]
            objs[num] = (head, data)
            pos = payload.find(b"endobj", data_at + length)
            pos = pos + 6 if pos != -1 else len(payload)
        else:
            objs[num] = (payload[body_at : end_obj if end_obj != -1 else None], None)
            pos = end_obj + 6 if end_obj != -1 else len(payload)
    return objs


def _ref(head: bytes, key: bytes) -> int | None:
    m = re.search(rb"/" + key + rb"\s+(\d+)\s+\d+\s+R", head)
    return int(m.group(1)) if m else None


def _page_order(objs) -> list[int]:
    """Page object numbers in document order via the /Root → /Pages →
    /Kids tree walk; falls back to /Type /Page objects in object-number
    order when the tree is unwalkable."""
    roots = [n for n, (h, _) in objs.items() if b"/Type" in h and b"/Catalog" in h]
    pages: list[int] = []

    def walk(num: int, depth: int, seen: set):
        if depth > 32 or num in seen or num not in objs:
            return
        seen.add(num)
        head, _ = objs[num]
        if re.search(rb"/Type\s*/Pages\b", head):
            kids = re.search(rb"/Kids\s*\[([^\]]*)\]", head)
            if kids:
                for km in re.finditer(rb"(\d+)\s+\d+\s+R", kids.group(1)):
                    walk(int(km.group(1)), depth + 1, seen)
        elif re.search(rb"/Type\s*/Page\b", head):
            pages.append(num)

    for root in roots:
        top = _ref(objs[root][0], b"Pages")
        if top is not None:
            walk(top, 0, set())
    if not pages:
        pages = sorted(
            n
            for n, (h, _) in objs.items()
            if re.search(rb"/Type\s*/Page\b", h)
        )
    return pages


_OCTAL = re.compile(rb"[0-7]{1,3}")

# span-jump patterns for the content-stream scanner: each one reproduces
# the continuation character set of the branch it replaces EXACTLY (note
# the deliberate asymmetries of the original loops: \x00/\x0c terminate
# neither names nor numbers, \x0c does not terminate operators)
_WS_RUN = re.compile(rb"[ \t\r\n\x00\x0c]+")
_EOL_RUN = re.compile(rb"[^\r\n]*")
_NAME_RUN = re.compile(rb"[^ \t\r\n()<>\[\]{}/%]*")
_NUM_RUN = re.compile(rb"[+\-.0-9eE]*")
_OP_RUN = re.compile(rb"[^ \t\r\n\x00()<>\[\]{}/%]*")
_STR_SPECIAL = re.compile(rb"[\\()]")


def _tokens(data: bytes):
    """Content-stream tokens: ('str', bytes) | ('op', bytes). Numbers,
    names and array brackets are skipped — only strings and operators
    drive text assembly. Scanning jumps whole spans with compiled
    regexes instead of stepping byte-by-byte (a bytes allocation per
    character); token boundaries and output are identical."""
    i, n = 0, len(data)
    while i < n:
        c = data[i : i + 1]
        if c in b" \t\r\n\x00\x0c":
            i = _WS_RUN.match(data, i).end()
        elif c == b"%":  # comment to EOL
            i = _EOL_RUN.match(data, i + 1).end()
        elif c == b"(":
            out, depth, i = bytearray(), 1, i + 1
            while i < n and depth:
                m = _STR_SPECIAL.search(data, i)
                if m is None:
                    out += data[i:n]
                    i = n
                    break
                if m.start() > i:
                    out += data[i : m.start()]
                    i = m.start()
                ch = data[i : i + 1]
                if ch == b"\\":
                    esc = data[i + 1 : i + 2]
                    simple = {
                        b"n": b"\n", b"r": b"\r", b"t": b"\t",
                        b"b": b"\b", b"f": b"\x0c",
                        b"(": b"(", b")": b")", b"\\": b"\\",
                    }
                    if esc in simple:
                        out += simple[esc]
                        i += 2
                    elif esc in (b"\n", b"\r"):  # line continuation
                        i += 2
                        if esc == b"\r" and data[i : i + 1] == b"\n":
                            i += 1
                    else:
                        om = _OCTAL.match(data, i + 1)
                        if om:
                            out.append(int(om.group(0), 8) & 0xFF)
                            i = om.end()
                        else:
                            out += esc
                            i += 2
                else:
                    if ch == b"(":
                        depth += 1
                    elif ch == b")":
                        depth -= 1
                        if not depth:
                            i += 1
                            break
                    out += ch
                    i += 1
            yield ("str", bytes(out))
        elif c == b"<":
            if data[i + 1 : i + 2] == b"<":
                i += 2
            else:
                j = data.find(b">", i + 1)
                j = j if j != -1 else n
                hexed = re.sub(rb"\s", b"", data[i + 1 : j])
                if len(hexed) % 2:
                    hexed += b"0"
                try:
                    yield ("str", bytes.fromhex(hexed.decode("ascii")))
                except ValueError:
                    pass
                i = j + 1
        elif c == b">":
            i += 2 if data[i + 1 : i + 2] == b">" else 1
        elif c == b"/":
            i = _NAME_RUN.match(data, i + 1).end()
        elif c in b"[]{}":
            i += 1
        elif c in b"+-.0123456789":
            i = _NUM_RUN.match(data, i + 1).end()
        else:
            j = _OP_RUN.match(data, i + 1).end()
            yield ("op", data[i:j])
            i = j


def _decode_text_bytes(raw: bytes) -> str:
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be", errors="replace")
    return raw.decode("utf-8", errors="replace")


_LINE_OPS = frozenset((b"Td", b"TD", b"T*", b"Tm"))
_SHOW_OPS = frozenset((b"Tj", b"'", b'"', b"TJ"))


def _stream_text(data: bytes) -> str:
    """Text-showing assembly: Tj/'/"/TJ emit; Td/TD/T*/Tm mark a line
    move that becomes ONE '\\n' before the next showing (never before
    the first)."""
    parts: list[str] = []
    pending: list[bytes] = []  # strings since last op, in token order
    newline = False
    for kind, val in _tokens(data):
        if kind == "str":
            pending.append(val)
            continue
        if val in _SHOW_OPS:
            if val == b"TJ":
                shown = b"".join(pending)  # array strings, kerning dropped
            else:
                shown = pending[-1] if pending else b""
                if val in (b"'", b'"'):
                    newline = newline or bool(parts)
            if newline and parts:
                parts.append("\n")
            newline = False
            parts.append(_decode_text_bytes(shown))
        elif val in _LINE_OPS:
            newline = True
        pending.clear()
    return "".join(parts)


def extract_pdf_text(payload: bytes) -> tuple[str, int, bool]:
    """(text, n_pages, extract_ok) for a PDF binary — the PySpark-native
    replacement for the reference's PyPDF2 read (preprocessing.py:340):
    per-page extraction, pages joined with a single space.

    extract_ok=False when any page's content uses a filter outside the
    raw/FlateDecode subset or fails to decompress (such pages contribute
    no text but still count toward n_pages), AND for payloads with no
    parseable PDF objects at all (r05): junk bytes are not "a PDF with
    zero pages", and callers like build_index --pdf-col use the flag to
    skip rows rather than silently index them as empty documents. A
    genuine zero-page PDF (catalog + empty /Kids) still reads ok=True."""
    objs = _scan_objects(payload)
    if not objs:
        return "", 0, False
    page_nums = _page_order(objs)
    texts, ok = [], True
    for pnum in page_nums:
        head, _ = objs[pnum]
        crefs = []
        arr = re.search(rb"/Contents\s*\[([^\]]*)\]", head)
        if arr:
            crefs = [int(m.group(1)) for m in re.finditer(rb"(\d+)\s+\d+\s+R", arr.group(1))]
        else:
            one = _ref(head, b"Contents")
            if one is not None:
                crefs = [one]
        page_parts = []
        for cref in crefs:
            chead, cdata = objs.get(cref, (b"", None))
            if cdata is None:
                continue
            filt = re.search(rb"/Filter\s*(?:\[\s*)?/(\w+)", chead)
            if filt and filt.group(1) != b"FlateDecode":
                ok = False
                continue
            if filt:
                try:
                    cdata = zlib.decompress(cdata)
                except zlib.error:
                    ok = False
                    continue
            page_parts.append(_stream_text(cdata))
        texts.append("".join(page_parts))
    return " ".join(texts), len(page_nums), ok
