"""Minimal pure-Python PDF text extractor (public PDF 1.7 spec subset).

The reference's first touch of every document is pdfplumber's
``extract_text`` over text-based bank statements
(``extractors/bb_statement.py:28-31``). pdfplumber is absent from this
container, so this module implements the narrow subset those documents
need, from the published PDF spec only:

- objects located by direct ``N G obj … endobj`` scan (no xref needed —
  also makes the extractor robust to truncated/append-updated files);
- stream payloads, uncompressed or ``FlateDecode`` (zlib);
- text-showing operators ``Tj``, ``'``, ``"``, ``TJ`` with literal
  ``(…)`` strings (escape sequences, octal codes, balanced parens,
  line continuations) and hex ``<…>`` strings;
- line structure from ``Td``/``TD``/``T*``/``'``/``"`` and ``ET``.

Out of scope, by design (documents using them surface a decode_error
upstream rather than silently wrong text): encryption, CID/Type0
composite fonts with ToUnicode CMaps, xref streams carrying object
streams (``/ObjStm``), LZW/ASCII85 filters. Single-byte text is decoded
as latin-1, a superset-compatible reading of PDFDocEncoding/WinAnsi for
the characters these statements use; UTF-16BE strings (BOM ``FE FF``)
are decoded as such.
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"\d+\s+\d+\s+obj\b(.*?)\bendobj", re.S)
_STREAM_START_RE = re.compile(rb"\bstream\r?\n")
_LEN_RE = re.compile(rb"/Length\s+(\d+)\b(?!\s+\d+\s+R)")
_NUM_RE = re.compile(rb"[-+.0-9]+")
_NAME_RE = re.compile(rb"/[^\s\[\]()<>/{}%]*")
_OPWORD_RE = re.compile(rb"[A-Za-z'\"*]{1,8}")

_ESCAPES = {
    ord("n"): 0x0A,
    ord("r"): 0x0D,
    ord("t"): 0x09,
    ord("b"): 0x08,
    ord("f"): 0x0C,
}

#: Operators that show their string operand(s).
_SHOW_OPS = {b"Tj", b"'", b'"', b"TJ"}
#: Operators that move to a new line (newline in extracted text).
_NEWLINE_OPS = {b"Td", b"TD", b"T*", b"'", b'"', b"ET"}


def _decode_pdf_string(b: bytes) -> str:
    if b.startswith(b"\xfe\xff"):
        return b[2:].decode("utf-16-be", errors="replace")
    return b.decode("latin-1")


def _tokens(s: bytes):
    """Yield ("str", bytes) | ("op", bytes) tokens from a content stream.

    Numbers, names, dict/array delimiters and whitespace are consumed but
    only ``[``/``]`` (TJ array bounds) and operator words are emitted.
    """
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == 0x28:  # "(" literal string, balanced parens + escapes
            j, depth, buf = i + 1, 1, bytearray()
            while j < n and depth:
                ch = s[j]
                if ch == 0x5C:  # backslash
                    j += 1
                    if j >= n:
                        break
                    e = s[j]
                    if e in _ESCAPES:
                        buf.append(_ESCAPES[e])
                    elif 0x30 <= e <= 0x37:  # up to 3 octal digits
                        digits = [e]
                        while len(digits) < 3 and j + 1 < n and 0x30 <= s[j + 1] <= 0x37:
                            j += 1
                            digits.append(s[j])
                        buf.append(int(bytes(digits), 8) & 0xFF)
                    elif e in (0x0A, 0x0D):  # line continuation
                        if e == 0x0D and j + 1 < n and s[j + 1] == 0x0A:
                            j += 1
                    else:  # \( \) \\ and any other char → itself
                        buf.append(e)
                elif ch == 0x28:
                    depth += 1
                    buf.append(ch)
                elif ch == 0x29:
                    depth -= 1
                    if depth:
                        buf.append(ch)
                else:
                    buf.append(ch)
                j += 1
            yield ("str", bytes(buf))
            i = j
        elif c == 0x3C:  # "<"
            if s[i : i + 2] == b"<<":
                i += 2
            else:
                j = s.find(b">", i + 1)
                if j < 0:
                    j = n
                hexs = re.sub(rb"[^0-9A-Fa-f]", b"", s[i + 1 : j])
                if len(hexs) % 2:
                    hexs += b"0"
                yield ("str", bytes.fromhex(hexs.decode("ascii")))
                i = j + 1
        elif c == 0x3E:  # ">>" dict close
            i += 2 if s[i : i + 2] == b">>" else 1
        elif c in (0x5B, 0x5D):  # [ ]
            yield ("op", bytes([c]))
            i += 1
        elif c == 0x2F:  # /Name
            i = _NAME_RE.match(s, i).end()
        elif c == 0x25:  # % comment to EOL
            j = s.find(b"\n", i)
            i = n if j < 0 else j + 1
        else:
            m = _NUM_RE.match(s, i)
            if m:
                i = m.end()
                continue
            m = _OPWORD_RE.match(s, i)
            if m:
                yield ("op", m.group(0))
                i = m.end()
            else:
                i += 1  # whitespace / anything else


def _stream_to_text(s: bytes) -> str:
    """Assemble extracted text from one decoded content stream."""
    out: list[str] = []
    pending: list[bytes] = []  # strings seen since the last operator
    in_array = False
    arr: list[bytes] = []
    for kind, tok in _tokens(s):
        if kind == "str":
            (arr if in_array else pending).append(tok)
            continue
        if tok == b"[":
            in_array, arr = True, []
            continue
        if tok == b"]":
            in_array = False
            pending = [b"".join(arr)]
            continue
        if tok in _NEWLINE_OPS and out:
            # every line move is a newline — consecutive T* moves are
            # REAL blank lines (build_pdf emits one T* per source line,
            # so round-trips preserve interior blank lines exactly)
            out.append("\n")
        if tok in _SHOW_OPS and pending:
            # '"' takes (aw ac string) — string is last; Tj/'/TJ likewise.
            out.append(_decode_pdf_string(pending[-1]))
        pending = []
    return "".join(out)


def _iter_streams(data: bytes):
    for m in _OBJ_RE.finditer(data):
        body = m.group(1)
        sm = _STREAM_START_RE.search(body)
        if not sm:
            continue
        head, start = body[: sm.start()], sm.end()
        lm = _LEN_RE.search(head)
        if lm and start + int(lm.group(1)) <= len(body):
            # exact slice — binary payloads may contain any byte sequence
            raw = body[start : start + int(lm.group(1))]
        else:
            end = body.find(b"endstream", start)
            raw = body[start : end if end >= 0 else len(body)]
            # writers put one EOL between payload and "endstream"
            if raw.endswith(b"\r\n"):
                raw = raw[:-2]
            elif raw.endswith((b"\n", b"\r")):
                raw = raw[:-1]
        if b"/FlateDecode" in head:
            try:
                raw = zlib.decompress(raw)
            except zlib.error:
                try:  # writer counted the trailing EOL inside Length
                    raw = zlib.decompress(raw.rstrip(b"\r\n"))
                except zlib.error:
                    continue  # undecodable filter payload — skip stream
        yield raw


def _pdf_string(s: str) -> bytes:
    """Encode one text line as a PDF literal string. ASCII-safe text is
    written as latin-1; anything else as a UTF-16BE string (BOM FE FF,
    per spec §7.9.2.2). Delimiters and EOL bytes are escaped so the
    payload survives any byte value (UTF-16BE code units may contain
    ``(``/``)``/``\\``/CR/LF bytes)."""
    try:
        raw = s.encode("latin-1")
    except UnicodeEncodeError:
        raw = b"\xfe\xff" + s.encode("utf-16-be")
    out = bytearray(b"(")
    for b in raw:
        if b in (0x28, 0x29, 0x5C):  # ( ) \
            out += b"\\" + bytes([b])
        elif b in (0x0A, 0x0D):  # raw EOLs are normalized by readers
            out += ("\\%03o" % b).encode()
        else:
            out.append(b)
    out += b")"
    return bytes(out)


def build_pdf(text: str, compress: bool = True) -> bytes:
    """Write ``text`` as a small but VALID one-page PDF (Helvetica,
    one ``Tj`` per line, ``T*`` line moves, correct xref + trailer).

    ``extract_pdf_text(build_pdf(t)) == t`` for any ``t`` without
    trailing newlines (text extraction has no trailing-newline concept).
    The writer side of the S1 surface: fixtures for the real-codec
    round-trip query (p8) and a minimal PDF sink."""
    ops = [b"BT /F1 10 Tf 12 TL 72 720 Td"]
    for i, line in enumerate(text.split("\n")):
        if i:
            ops.append(b"T*")
        ops.append(_pdf_string(line) + b" Tj")
    ops.append(b"ET")
    content = b"\n".join(ops)
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b" /Filter /FlateDecode"

    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d%s >>\nstream\n%s\nendstream" % (len(content), filt, content),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = []
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%s\nendobj\n" % (i, body)
    xref_at = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objects) + 1)
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % (
        len(objects) + 1,
        xref_at,
    )
    return bytes(out)


def extract_pdf_text(data: bytes) -> str | None:
    """Extract text from a ``%PDF`` byte payload; None if no text found.

    Page/stream texts are joined with newlines, matching the reference's
    ``"\\n".join(page.extract_text() …)`` shape
    (``extractors/bb_statement.py:28-31``).
    """
    if not data.startswith(b"%PDF"):
        return None
    parts: list[str] = []
    for stream in _iter_streams(data):
        # Only content streams carry text operators; streams without a
        # text block (fonts, images, metadata) yield nothing.
        if b"BT" not in stream and b"Tj" not in stream and b"TJ" not in stream:
            continue
        # rstrip only: a document whose first lines are EMPTY still has
        # them (leading `Tj ""` + T* moves) — stripping them would shift
        # every following line up. Trailing newlines have no extraction
        # concept (there is no "line move then nothing"), so they go.
        text = _stream_to_text(stream).rstrip("\n")
        if text:
            parts.append(text)
    return "\n".join(parts) if parts else None
