"""Minimal pure-Python PDF text extractor (public PDF 1.7 spec subset).

The reference's first touch of every document is pdfplumber's
``extract_text`` over text-based bank statements
(``extractors/bb_statement.py:28-31``). pdfplumber is absent from this
container, so this module implements the narrow subset those documents
need, from the published PDF spec only:

- objects located two ways and merged: direct ``N G obj … endobj`` scan
  (robust to truncated/append-updated files) PLUS the real PDF 1.5+
  cross-reference machinery — ``startxref`` → xref STREAM (``/W`` field
  widths, ``/Index`` subsections, FlateDecode + PNG Up predictor
  ``/DecodeParms /Predictor 12``), ``/Prev`` chain, and expansion of
  compressed object streams (``/Type /ObjStm``);
- stream payloads, uncompressed or ``FlateDecode`` (zlib), with PNG
  predictors 10–15 un-applied after inflate;
- text-showing operators ``Tj``, ``'``, ``"``, ``TJ`` with literal
  ``(…)`` strings (escape sequences, octal codes, balanced parens,
  line continuations) and hex ``<…>`` strings;
- line structure from ``Td``/``TD``/``T*``/``'``/``"`` and ``ET``;
- **composite fonts**: the page's ``/Resources /Font`` table is
  resolved, ``Tf`` tracks the active font through the content stream,
  and strings shown under a ``/Subtype /Type0`` font are decoded as
  fixed-width CID codes through the font's ``/ToUnicode`` CMap
  (``bfchar``, ``bfrange`` with both increment and array forms,
  ``codespacerange`` width) — the PDF-1.7 §9.10.3 path real bank PDFs
  use (ref first-touch: ``extractors/bb_statement.py:28-31``).

Also handled (public spec §7.6): the **standard security handler**
with RC4 (V≤2, R 2/3) and an EMPTY user password — the way banks
"protect" statements while keeping them readable: the file key is
derived per Algorithm 2, the /U entry verified (Algorithm 4/5), and
stream payloads decrypted per-object (Algorithm 1) before filters.
Files demanding a real user password, or AES (V≥4), quarantine as
undecodable rather than misread.

Out of scope, by design (documents using them surface a decode_error
upstream rather than silently wrong text): AES encryption,
DCT/JBIG2/CCITT image filters, predefined (non-embedded) CMaps by
name, Type3 glyph procedures. Single-byte text is decoded as latin-1,
a superset-compatible reading of PDFDocEncoding/WinAnsi for the
characters these statements use; UTF-16BE strings (BOM ``FE FF``) are
decoded as such.
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


def _decode_pdf_string(b: bytes, cmap: dict[int, str] | None = None, width: int = 2) -> str:
    if cmap is not None:
        # composite-font string: fixed-width big-endian CID codes mapped
        # through the font's ToUnicode CMap (unmapped code → U+FFFD)
        return "".join(
            cmap.get(int.from_bytes(b[i : i + width], "big"), "�")
            for i in range(0, len(b) - len(b) % width, width)
        )
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
        elif c == 0x2F:  # /Name — emitted so Tf can identify its font
            m = _NAME_RE.match(s, i)
            yield ("name", m.group(0))
            i = m.end()
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


def _stream_to_text(s: bytes, fonts: dict[bytes, tuple | None] | None = None) -> str:
    """Assemble extracted text from one decoded content stream.

    ``fonts`` maps resource names (``b"/F1"``) to ``None`` for simple
    fonts or ``(cmap, code_width)`` for Type0/CID fonts; ``Tf`` swaps
    the active decoder mid-stream exactly as a conforming reader does.
    """
    out: list[str] = []
    pending: list[bytes] = []  # strings seen since the last operator
    in_array = False
    arr: list[bytes] = []
    last_name: bytes | None = None
    cur: tuple | None = None  # active CID decoder, None = simple font
    for kind, tok in _tokens(s):
        if kind == "name":
            last_name = tok
            continue
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
        if tok == b"Tf" and fonts is not None and last_name is not None:
            cur = fonts.get(last_name)
        if tok in _NEWLINE_OPS and out:
            # every line move is a newline — consecutive T* moves are
            # REAL blank lines (build_pdf emits one T* per source line,
            # so round-trips preserve interior blank lines exactly)
            out.append("\n")
        if tok in _SHOW_OPS and pending:
            # '"' takes (aw ac string) — string is last; Tj/'/TJ likewise.
            if cur is None:
                out.append(_decode_pdf_string(pending[-1]))
            else:
                out.append(_decode_pdf_string(pending[-1], cur[0], cur[1]))
        pending = []
    return "".join(out)


def _png_unpredict(data: bytes, columns: int) -> bytes:
    """Undo PNG predictors 10–15 (PDF §7.4.4.4): rows of ``columns``
    bytes, each preceded by a filter-type byte; bpp = 1 byte."""
    rowlen = columns + 1
    out = bytearray()
    prior = bytes(columns)
    for r in range(len(data) // rowlen):
        ft = data[r * rowlen]
        line = data[r * rowlen + 1 : (r + 1) * rowlen]
        recon = bytearray(columns)
        for i in range(min(columns, len(line))):
            left = recon[i - 1] if i else 0
            up = prior[i]
            ul = prior[i - 1] if i else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = left
            elif ft == 2:
                pred = up
            elif ft == 3:
                pred = (left + up) // 2
            elif ft == 4:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
            else:
                pred = 0
            recon[i] = (line[i] + pred) & 0xFF
        out += recon
        prior = bytes(recon)
    return bytes(out)


_PRED_RE = re.compile(rb"/Predictor\s+(\d+)")
_COLS_RE = re.compile(rb"/Columns\s+(\d+)")


def _lzw_decode(data: bytes) -> bytes:
    """PDF/TIFF LZW (spec §7.4.4.2): variable-width codes starting at
    9 bits, clear code 256, EOD 257, EarlyChange=1 (width bumps one
    code before the table fills — the PDF default)."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width, buf, nbits = 9, 0, 0
    prev: bytes | None = None
    for byte in data:
        buf = (buf << 8) | byte
        nbits += 8
        while nbits >= width:
            nbits -= width
            code = (buf >> nbits) & ((1 << width) - 1)
            if code == 256:  # clear table
                table = table[:258]
                width, prev = 9, None
                continue
            if code == 257:  # EOD
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:  # KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            if len(table) + 1 >= (1 << width) and width < 12:  # EarlyChange
                width += 1
    return bytes(out)


def _runlength_decode(data: bytes) -> bytes:
    """RunLengthDecode (spec §7.4.5): length byte n<128 → copy n+1
    literal bytes; n>128 → repeat next byte 257−n times; 128 = EOD."""
    out = bytearray()
    i = 0
    while i < len(data):
        n = data[i]
        if n == 128:
            break
        if n < 128:
            out += data[i + 1 : i + 2 + n]
            i += 2 + n
        else:
            out += data[i + 1 : i + 2] * (257 - n)
            i += 2
    return bytes(out)


def _ascii_hex_decode(data: bytes) -> bytes:
    end = data.find(b">")
    hexs = re.sub(rb"[^0-9A-Fa-f]", b"", data[: end if end >= 0 else len(data)])
    if len(hexs) % 2:
        hexs += b"0"
    return bytes.fromhex(hexs.decode("ascii"))


# --- standard security handler (spec §7.6.3, RC4 / R2-R3) ------------

_PW_PAD = bytes.fromhex(
    "28BF4E5E4E758A4164004E56FFFA01082E2E00B6D0683E802F0CA9FE6453697A"
)


class PdfPasswordError(ValueError):
    """The file demands a non-empty user password (or unsupported AES)."""


try:  # OpenSSL-backed ARC4 when available (~100x the Python loop);
    # the pure-Python fallback below stays the reference implementation.
    from cryptography.hazmat.decrepit.ciphers.algorithms import ARC4 as _ARC4
    from cryptography.hazmat.primitives.ciphers import Cipher as _Cipher
except ImportError:  # pragma: no cover - environment without cryptography
    _ARC4 = None


def _rc4(key: bytes, data: bytes) -> bytes:
    if _ARC4 is not None:
        try:  # OpenSSL validates against a fixed key-size list; the PDF
            cipher = _Cipher(_ARC4(key), mode=None)  # spec allows any
        except ValueError:  # 8-bit increment — odd sizes take the loop
            return _rc4_py(key, data)
        enc = cipher.encryptor()
        return enc.update(data) + enc.finalize()
    return _rc4_py(key, data)


def _rc4_py(key: bytes, data: bytes) -> bytes:
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray()
    i = j = 0
    for b in data:
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out.append(b ^ S[(S[i] + S[j]) & 0xFF])
    return bytes(out)


def _std_file_key(
    password: bytes, O: bytes, P: int, id0: bytes, R: int, length_bits: int
) -> bytes:
    """Algorithm 2: the file encryption key from a (user) password."""
    import hashlib
    import struct

    h = hashlib.md5()
    h.update((password + _PW_PAD)[:32])
    h.update(O[:32])
    h.update(struct.pack("<i", P))
    h.update(id0)
    key = h.digest()
    n = length_bits // 8 if R >= 3 else 5
    if R >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    return key[:n]


def _std_user_check(key: bytes, id0: bytes, R: int) -> bytes:
    """Algorithm 4 (R2) / 5 (R3): the expected /U value for ``key``."""
    import hashlib

    if R == 2:
        return _rc4(key, _PW_PAD)
    x = hashlib.md5(_PW_PAD + id0).digest()
    x = _rc4(key, x)
    for i in range(1, 20):
        x = _rc4(bytes(b ^ i for b in key), x)
    return x  # compare first 16 bytes of /U


def _obj_key(key: bytes, num: int, gen: int = 0) -> bytes:
    """Algorithm 1: the per-object RC4 key."""
    import hashlib

    ext = key + bytes(
        [num & 0xFF, (num >> 8) & 0xFF, (num >> 16) & 0xFF, gen & 0xFF, (gen >> 8) & 0xFF]
    )
    return hashlib.md5(ext).digest()[: min(len(key) + 5, 16)]


def _dict_string(body: bytes, key: bytes) -> bytes | None:
    """The string value of ``/Key`` in a dict body (literal or hex)."""
    m = re.search(rb"/" + key + rb"\s*[(<]", body)
    if m is None:
        return None
    for kind, tok in _tokens(body[m.end() - 1 :]):
        if kind == "str":
            return tok
    return None


def _decryption_key(data: bytes) -> bytes | None:
    """None when the file is unencrypted; the RC4 file key when it uses
    the standard handler with an EMPTY user password; raises
    :class:`PdfPasswordError` for real passwords or AES."""
    em = re.search(rb"/Encrypt\s+(\d+)\s+\d+\s+R", data)
    if em is None:
        return None
    om = re.search(
        rb"(?<![0-9])%d\s+\d+\s+obj\b(.*?)\bendobj" % int(em.group(1)), data, re.S
    )
    if om is None:
        raise PdfPasswordError("encrypt dict unresolvable")
    enc = om.group(1)
    if b"/Standard" not in enc:
        raise PdfPasswordError("non-standard security handler")
    vm = re.search(rb"/V\s+(\d+)", enc)
    rm = re.search(rb"/R\s+(\d+)", enc)
    V = int(vm.group(1)) if vm else 0
    R = int(rm.group(1)) if rm else 2
    if V > 2 or R > 3:
        raise PdfPasswordError(f"unsupported encryption V={V} R={R} (AES?)")
    lm = re.search(rb"/Length\s+(\d+)", enc)
    length_bits = int(lm.group(1)) if lm else 40
    pm = re.search(rb"/P\s+(-?\d+)", enc)
    P = int(pm.group(1)) if pm else -1
    O = _dict_string(enc, b"O")
    U = _dict_string(enc, b"U")
    idm = re.search(rb"/ID\s*\[\s*<([0-9A-Fa-f]+)>", data)
    id0 = bytes.fromhex(idm.group(1).decode("ascii")) if idm else b""
    if O is None or U is None:
        raise PdfPasswordError("encrypt dict missing /O or /U")
    key = _std_file_key(b"", O, P, id0, R, length_bits)
    expect = _std_user_check(key, id0, R)
    ncmp = 16 if R >= 3 else 32
    if expect[:ncmp] != U[:ncmp]:
        raise PdfPasswordError("user password required")
    return key


_FILTER_RE = re.compile(rb"/Filter\s*(?:\[((?:\s*/\w+)*)\s*\]|/(\w+))")


def _filter_chain(head: bytes) -> list[bytes]:
    m = _FILTER_RE.search(head)
    if not m:
        return []
    if m.group(2) is not None:
        return [m.group(2)]
    return re.findall(rb"/(\w+)", m.group(1))


def _stream_payload(
    body: bytes, key: bytes | None = None, num: int = 0
) -> tuple[bytes, bytes | None]:
    """(head-dict bytes, decoded payload | None) for one object body.

    Handles /Length exact slicing with an endstream-scan fallback, the
    full decode-filter CHAIN in declared order — FlateDecode,
    LZWDecode, ASCIIHexDecode, ASCII85Decode, RunLengthDecode (spec
    §7.4; real writers chain e.g. [/ASCII85Decode /FlateDecode]) —
    and PNG predictors declared in /DecodeParms. Unknown filters
    (DCT/JBIG2/CCITT image codecs, Crypt) yield None → the stream is
    skipped, quarantine-style, never misread."""
    sm = _STREAM_START_RE.search(body)
    if not sm:
        return body, None
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
    if key is not None:
        # standard security handler: streams decrypt per-object BEFORE
        # any decode filter runs (spec: encryption is the outermost layer)
        raw = _rc4(_obj_key(key, num), raw)
    for filt in _filter_chain(head):
        try:
            if filt == b"FlateDecode" or filt == b"Fl":
                try:
                    raw = zlib.decompress(raw)
                except zlib.error:
                    # writer counted the trailing EOL inside Length
                    raw = zlib.decompress(raw.rstrip(b"\r\n"))
            elif filt == b"LZWDecode" or filt == b"LZW":
                raw = _lzw_decode(raw)
            elif filt == b"ASCIIHexDecode" or filt == b"AHx":
                raw = _ascii_hex_decode(raw)
            elif filt == b"ASCII85Decode" or filt == b"A85":
                import base64

                txt = raw.strip()
                if txt.startswith(b"<~"):
                    txt = txt[2:]
                if not txt.endswith(b"~>"):
                    txt += b"~>"
                raw = base64.a85decode(txt, adobe=True, ignorechars=b" \t\r\n")
            elif filt == b"RunLengthDecode" or filt == b"RL":
                raw = _runlength_decode(raw)
            else:  # image/crypt filters — not text-bearing, skip stream
                return head, None
        except (zlib.error, ValueError, IndexError):
            return head, None  # undecodable filter payload
    pm = _PRED_RE.search(head)
    if pm and int(pm.group(1)) >= 10:
        cm = _COLS_RE.search(head)
        raw = _png_unpredict(raw, int(cm.group(1)) if cm else 1)
    return head, raw


def _iter_streams(data: bytes):
    for m in _OBJ_RE.finditer(data):
        _, raw = _stream_payload(m.group(1))
        if raw is not None:
            yield raw


_OBJ_FULL_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)\bendobj", re.S)
_INT_KEY = {
    key: re.compile(rb"/" + key + rb"\s+(\d+)\b")
    for key in (b"N", b"First", b"Prev", b"Size")
}


def _object_map(data: bytes, key: bytes | None = None) -> dict[int, bytes]:
    """Object number → body bytes, from a direct full-file scan plus
    expansion of every compressed object stream (``/Type /ObjStm``,
    PDF §7.5.7: header of N (num, offset) pairs, then the member
    object bodies — members carry no obj/endobj wrappers). ``key``
    decrypts ObjStm payloads; members are not re-encrypted (spec)."""
    objs: dict[int, bytes] = {}
    for m in _OBJ_FULL_RE.finditer(data):
        objs.setdefault(int(m.group(1)), m.group(3))
    for onum0, body in list(objs.items()):
        head, raw = _stream_payload(body, key, onum0)
        if raw is None or b"/ObjStm" not in head:
            continue
        nm, fm = _INT_KEY[b"N"].search(head), _INT_KEY[b"First"].search(head)
        if not nm or not fm:
            continue
        n, first = int(nm.group(1)), int(fm.group(1))
        try:
            nums = raw[:first].split()
            pairs = [(int(nums[2 * i]), int(nums[2 * i + 1])) for i in range(n)]
        except (ValueError, IndexError):
            continue
        for i, (onum, off) in enumerate(pairs):
            end = pairs[i + 1][1] if i + 1 < len(pairs) else len(raw) - first
            objs.setdefault(onum, raw[first + off : first + end])
    return objs


def _xref_objects(data: bytes) -> dict[int, bytes]:
    """Objects located via the PDF 1.5 cross-reference machinery:
    follow the LAST ``startxref`` to an xref STREAM (``/Type /XRef``),
    read its ``/W``-packed entries (type 1 = absolute offset → parse
    the object there; type 2 = ObjStm member, already expanded by the
    scan), and chase ``/Prev`` through incremental updates. Classic
    ``xref`` tables return nothing here — the direct scan covers them.
    Entries from the NEWEST table win, making append-updated files
    resolve to their current object versions."""
    out: dict[int, bytes] = {}
    last = None
    for last in re.finditer(rb"startxref\s+(\d+)", data):
        pass
    if last is None:
        return out
    pos, seen = int(last.group(1)), set()
    while 0 <= pos < len(data) and pos not in seen:
        seen.add(pos)
        m = _OBJ_FULL_RE.match(data, pos)
        if not m:
            break  # classic xref table (or garbage) — scan already covers
        head, raw = _stream_payload(m.group(3))
        if raw is None or b"/XRef" not in head:
            break
        wm = re.search(rb"/W\s*\[\s*(\d+)\s+(\d+)\s+(\d+)\s*\]", head)
        if not wm:
            break
        w1, w2, w3 = (int(x) for x in wm.groups())
        entry = w1 + w2 + w3
        sizem = _INT_KEY[b"Size"].search(head)
        size = int(sizem.group(1)) if sizem else 0
        im = re.search(rb"/Index\s*\[([^\]]*)\]", head)
        if im:
            idx = [int(x) for x in im.group(1).split()]
            sections = list(zip(idx[0::2], idx[1::2]))
        else:
            sections = [(0, size)]
        p = 0
        for start_num, count in sections:
            for k in range(count):
                if p + entry > len(raw):
                    break
                f1 = int.from_bytes(raw[p : p + w1], "big") if w1 else 1
                f2 = int.from_bytes(raw[p + w1 : p + w1 + w2], "big")
                p += entry
                if f1 == 1:
                    om = _OBJ_FULL_RE.match(data, f2)
                    if om and int(om.group(1)) == start_num + k:
                        out.setdefault(start_num + k, om.group(3))
        pm = _INT_KEY[b"Prev"].search(head)
        if not pm:
            break
        pos = int(pm.group(1))
    return out


def _balanced_dict(body: bytes, start: int) -> bytes:
    """Slice a balanced ``<< … >>`` region beginning at ``start``."""
    i, depth, n = start, 0, len(body)
    while i < n - 1:
        two = body[i : i + 2]
        if two == b"<<":
            depth += 1
            i += 2
        elif two == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return body[start:i]
        else:
            i += 1
    return body[start:]


def _ref_or_inline(objs: dict[int, bytes], body: bytes, key: bytes) -> bytes | None:
    """Resolve ``/Key N G R`` to the referenced object's body, or slice
    an inline ``/Key << … >>`` dict; None when absent."""
    m = re.search(rb"/" + key + rb"\s+(\d+)\s+\d+\s+R", body)
    if m:
        return objs.get(int(m.group(1)))
    m = re.search(rb"/" + key + rb"\s*<<", body)
    if m:
        return _balanced_dict(body, m.end() - 2)
    return None


_HEXTOK_RE = re.compile(rb"<([0-9A-Fa-f]+)>|(\[)|(\])")


def _parse_tounicode(raw: bytes) -> tuple[dict[int, str], int]:
    """ToUnicode CMap (PDF §9.10.3) → (code → text, code byte width).

    Handles ``bfchar`` pairs, ``bfrange`` in both the incrementing-
    destination and explicit-array forms, and ``codespacerange`` for
    the code width (Identity-H's 2 bytes by default). Destinations are
    UTF-16BE and may be multi-unit (ligatures, surrogate pairs)."""
    cmap: dict[int, str] = {}
    width = 2
    m = re.search(rb"begincodespacerange\s*<([0-9A-Fa-f]+)>", raw)
    if m:
        width = max(1, len(m.group(1)) // 2)

    def _txt(hx: bytes) -> str:
        return bytes.fromhex(hx.decode("ascii")).decode("utf-16-be", "replace")

    for block in re.findall(rb"beginbfchar(.*?)endbfchar", raw, re.S):
        hx = [h for h, _, _ in _HEXTOK_RE.findall(block) if h]
        for src, dst in zip(hx[0::2], hx[1::2]):
            cmap[int(src, 16)] = _txt(dst)
    for block in re.findall(rb"beginbfrange(.*?)endbfrange", raw, re.S):
        toks = [next(g for g in t if g) for t in _HEXTOK_RE.findall(block)]
        i = 0
        while i + 1 < len(toks):
            lo, hi = int(toks[i], 16), int(toks[i + 1], 16)
            i += 2
            if i >= len(toks):
                break
            if toks[i] == b"[":
                i += 1
                code = lo
                while i < len(toks) and toks[i] != b"]":
                    cmap[code] = _txt(toks[i])
                    code += 1
                    i += 1
                i += 1  # skip ]
            else:
                base = bytes.fromhex(toks[i].decode("ascii"))
                bi = int.from_bytes(base, "big")
                for k in range(hi - lo + 1):
                    cmap[lo + k] = (
                        (bi + k).to_bytes(len(base), "big").decode("utf-16-be", "replace")
                    )
                i += 1
    return cmap, width


def _page_fonts(
    objs: dict[int, bytes], page: bytes, key: bytes | None = None
) -> dict[bytes, tuple | None]:
    """The page's ``/Resources /Font`` table as a name → decoder map:
    ``None`` for simple fonts, ``(cmap, width)`` for Type0/CID fonts
    (decoder from the font's ``/ToUnicode`` stream)."""
    fonts: dict[bytes, tuple | None] = {}
    res = _ref_or_inline(objs, page, b"Resources")
    if res is None:
        return fonts
    fdict = _ref_or_inline(objs, res, b"Font")
    if fdict is None:
        return fonts
    for m in re.finditer(rb"/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R", fdict):
        name, num = b"/" + m.group(1), int(m.group(2))
        body = objs.get(num)
        if body is None or name in fonts:
            continue
        decoder: tuple | None = None
        if re.search(rb"/Subtype\s*/Type0\b", body):
            tm = re.search(rb"/ToUnicode\s+(\d+)\s+\d+\s+R", body)
            tou = objs.get(int(tm.group(1))) if tm else None
            if tou is not None:
                _, raw = _stream_payload(tou, key, int(tm.group(1)))
                if raw is not None:
                    decoder = _parse_tounicode(raw)
            if decoder is None:
                decoder = ({}, 2)  # Type0 without usable CMap → U+FFFD
        fonts[name] = decoder
    return fonts


def _page_content(
    objs: dict[int, bytes], page: bytes, key: bytes | None = None
) -> bytes:
    """The page's decoded content bytes (/Contents ref or ref array)."""
    refs: list[int] = []
    m = re.search(rb"/Contents\s+(\d+)\s+\d+\s+R", page)
    if m:
        refs = [int(m.group(1))]
    else:
        m = re.search(rb"/Contents\s*\[(.*?)\]", page, re.S)
        if m:
            refs = [int(r) for r in re.findall(rb"(\d+)\s+\d+\s+R", m.group(1))]
    parts = []
    for num in refs:
        body = objs.get(num)
        if body is None:
            continue
        _, raw = _stream_payload(body, key, num)
        if raw is not None:
            parts.append(raw)
    return b"\n".join(parts)


def _ordered_pages(objs: dict[int, bytes]) -> list[bytes]:
    """Page objects in document order: walk the /Root → /Pages /Kids
    tree when present, else fall back to object-number order."""
    pages_by_num = {
        n: b for n, b in objs.items() if re.search(rb"/Type\s*/Page\b", b)
    }
    root = next(
        (b for b in objs.values() if re.search(rb"/Type\s*/Catalog\b", b)), None
    )
    ordered: list[bytes] = []
    if root is not None:
        stack = []
        m = re.search(rb"/Pages\s+(\d+)\s+\d+\s+R", root)
        if m:
            stack = [int(m.group(1))]
        seen: set[int] = set()
        while stack:
            num = stack.pop(0)
            if num in seen:
                continue
            seen.add(num)
            body = objs.get(num)
            if body is None:
                continue
            if num in pages_by_num:
                ordered.append(pages_by_num.pop(num))
                continue
            km = re.search(rb"/Kids\s*\[(.*?)\]", body, re.S)
            if km:
                kids = [int(r) for r in re.findall(rb"(\d+)\s+\d+\s+R", km.group(1))]
                stack = kids + stack
    ordered.extend(b for _, b in sorted(pages_by_num.items()))
    return ordered


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

    Two paths, structured first:

    1. **Structured** — build the object map (direct scan + ObjStm
       expansion + xref-stream entries), walk /Root → /Pages → page
       objects in document order, resolve each page's font table, and
       decode its content stream with per-font decoders (Type0/CID
       strings go through their ToUnicode CMap). This is the path real
       bank PDFs need.
    2. **Stream-scan fallback** — when no page structure is resolvable
       (truncated or unusual files), every text-bearing stream is
       decoded with simple-font semantics, the pre-round-4 behavior.

    Page/stream texts are joined with newlines, matching the reference's
    ``"\\n".join(page.extract_text() …)`` shape
    (``extractors/bb_statement.py:28-31``).
    """
    if not data.startswith(b"%PDF"):
        return None
    try:
        key = _decryption_key(data)
    except PdfPasswordError:
        return None  # needs a real password / AES — quarantine upstream
    parts: list[str] = []
    try:
        objs = _object_map(data, key)
        objs.update(_xref_objects(data))  # newest xref entries win
        for page in _ordered_pages(objs):
            content = _page_content(objs, page, key)
            if not content:
                continue
            text = _stream_to_text(content, _page_fonts(objs, page, key)).rstrip("\n")
            if text:
                parts.append(text)
    except Exception:  # noqa: BLE001 — malformed structure → fallback
        parts = []
    if parts:
        return "\n".join(parts)
    if key is not None:
        # encrypted file, structured walk found nothing: the raw-stream
        # fallback would read ciphertext — never emit garbage
        return None
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


def build_pdf_cid(text: str) -> bytes:
    """Write ``text`` as a VALID PDF 1.5-style document that exercises
    every modern structure the extractor handles — the fixture writer
    for the p9 gate entry:

    - the content stream shows hex strings of **2-byte CIDs assigned by
      order of first appearance** (NOT codepoints — meaningless without
      the CMap, so extraction must really resolve fonts);
    - the Type0 font (``/Encoding /Identity-H``, CIDFontType2
      descendant) carries a **/ToUnicode CMap** mixing ``bfrange``
      (consecutive-codepoint runs) and ``bfchar`` entries;
    - catalog, page tree, and font dicts live inside a compressed
      **object stream** (``/ObjStm``);
    - the only cross-reference is an **xref STREAM** (``/W [1 2 2]``,
      FlateDecode + PNG Up predictor ``/Predictor 12``) — there is no
      classic xref table, so location of the ObjStm members requires
      the real machinery.
    """
    lines = text.split("\n")
    chars = sorted({c for line in lines for c in line})
    cid_of = {c: i + 1 for i, c in enumerate(chars)}  # 0 = notdef

    # content stream: CID hex strings
    ops = [b"BT /F1 10 Tf 12 TL 72 720 Td"]
    for i, line in enumerate(lines):
        if i:
            ops.append(b"T*")
        hexs = "".join(f"{cid_of[c]:04X}" for c in line)
        ops.append(b"<" + hexs.encode("ascii") + b"> Tj")
    ops.append(b"ET")
    content = zlib.compress(b"\n".join(ops))

    # ToUnicode CMap: consecutive-codepoint runs (within the BMP) become
    # bfrange entries; everything else bfchar
    runs: list[tuple[int, int, str]] = []  # (cid_lo, cid_hi, char_lo)
    singles: list[tuple[int, str]] = []
    i = 0
    while i < len(chars):
        j = i
        while (
            j + 1 < len(chars)
            and ord(chars[j + 1]) == ord(chars[j]) + 1
            and ord(chars[j + 1]) <= 0xFFFF
            and ord(chars[i]) <= 0xFFFF
        ):
            j += 1
        if j > i:
            runs.append((cid_of[chars[i]], cid_of[chars[j]], chars[i]))
        else:
            singles.append((cid_of[chars[i]], chars[i]))
        i = j + 1

    def _u16(s: str) -> str:
        return s.encode("utf-16-be").hex().upper()

    cmap_parts = [
        b"/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
    ]
    for k in range(0, len(runs), 100):
        chunk = runs[k : k + 100]
        cmap_parts.append(b"%d beginbfrange\n" % len(chunk))
        for lo, hi, c in chunk:
            cmap_parts.append(
                f"<{lo:04X}> <{hi:04X}> <{_u16(c)}>\n".encode("ascii")
            )
        cmap_parts.append(b"endbfrange\n")
    for k in range(0, len(singles), 100):
        chunk = singles[k : k + 100]
        cmap_parts.append(b"%d beginbfchar\n" % len(chunk))
        for cid, c in chunk:
            cmap_parts.append(f"<{cid:04X}> <{_u16(c)}>\n".encode("ascii"))
        cmap_parts.append(b"endbfchar\n")
    cmap_parts.append(b"endcmap\nCMap currentdict /CMap defineresource pop\nend\nend\n")
    cmap = zlib.compress(b"".join(cmap_parts))

    # objects 1,2,3,5,6 live inside the ObjStm (object 8)
    members = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        5: b"<< /Type /Font /Subtype /Type0 /BaseFont /FinTrack-CID "
        b"/Encoding /Identity-H /DescendantFonts [6 0 R] /ToUnicode 7 0 R >>",
        6: b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /FinTrack-CID "
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
        b"/Supplement 0 >> /DW 500 >>",
    }
    header = []
    bodies = b""
    for num, body in members.items():
        header.append(b"%d %d" % (num, len(bodies)))
        bodies += body + b"\n"
    objstm_head = b" ".join(header) + b"\n"
    objstm_raw = objstm_head + bodies
    objstm = zlib.compress(objstm_raw)

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}

    def _emit(num: int, body: bytes) -> None:
        offsets[num] = len(out)
        out.extend(b"%d 0 obj\n" % num + body + b"\nendobj\n")

    _emit(4, b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
          % (len(content), content))
    _emit(7, b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
          % (len(cmap), cmap))
    _emit(8, b"<< /Type /ObjStm /N %d /First %d /Length %d /Filter /FlateDecode "
          b">>\nstream\n%s\nendstream"
          % (len(members), len(objstm_head), len(objstm), objstm))

    # xref stream (object 9): W=[1,4,2] (4-byte offsets — no 64 KB
    # cap); members of the ObjStm are type-2 entries, top-level
    # objects type-1, object 0 free
    xref_num = 9
    xref_at_placeholder = None
    rows: list[bytes] = []
    member_index = {num: i for i, num in enumerate(members)}
    for num in range(xref_num + 1):
        if num == 0:
            rows.append(bytes([0]) + (0).to_bytes(4, "big") + (0xFFFF).to_bytes(2, "big"))
        elif num in member_index:
            rows.append(bytes([2]) + (8).to_bytes(4, "big")
                        + member_index[num].to_bytes(2, "big"))
        elif num == xref_num:
            xref_at_placeholder = len(rows)
            rows.append(b"")  # filled once the offset is known
        else:
            rows.append(bytes([1]) + offsets[num].to_bytes(4, "big")
                        + (0).to_bytes(2, "big"))
    xref_offset = len(out)
    rows[xref_at_placeholder] = (
        bytes([1]) + xref_offset.to_bytes(4, "big") + (0).to_bytes(2, "big")
    )
    # PNG Up predictor over 7-byte rows
    pred = bytearray()
    prior = bytes(7)
    for row in rows:
        pred.append(2)
        pred.extend((row[i] - prior[i]) & 0xFF for i in range(7))
        prior = row
    xdata = zlib.compress(bytes(pred))
    _emit(
        xref_num,
        b"<< /Type /XRef /Size %d /W [1 4 2] /Root 1 0 R /Length %d "
        b"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 7 >> "
        b">>\nstream\n%s\nendstream" % (xref_num + 1, len(xdata), xdata),
    )
    out.extend(b"startxref\n%d\n%%%%EOF\n" % xref_offset)
    return bytes(out)


def build_pdf_encrypted(
    text: str,
    user_pw: bytes = b"",
    owner_pw: bytes = b"owner",
    R: int = 3,
    length_bits: int = 128,
) -> bytes:
    """Write ``text`` as a VALID RC4-encrypted PDF (standard security
    handler, spec §7.6.3) — the fixture writer for the encrypted-bank-
    statement path. ``/O`` comes from Algorithm 3 (owner password),
    ``/U`` from Algorithm 4/5, the file key from Algorithm 2 over
    ``user_pw`` (EMPTY by default — the real-world "protected but
    readable" shape), and the content stream is RC4-encrypted with its
    per-object key AFTER deflation, exactly as conforming writers do.
    ``R=2`` gives the 40-bit variant, ``R=3`` 128-bit."""
    import hashlib

    ops = [b"BT /F1 10 Tf 12 TL 72 720 Td"]
    for i, line in enumerate(text.split("\n")):
        if i:
            ops.append(b"T*")
        ops.append(_pdf_string(line) + b" Tj")
    ops.append(b"ET")
    content = zlib.compress(b"\n".join(ops))

    n = length_bits // 8 if R >= 3 else 5
    h = hashlib.md5((owner_pw + _PW_PAD)[:32]).digest()
    if R >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    okey = h[:n]
    O = _rc4(okey, (user_pw + _PW_PAD)[:32])
    if R >= 3:
        for i in range(1, 20):
            O = _rc4(bytes(b ^ i for b in okey), O)
    P = -4  # all standard permissions granted
    id0 = hashlib.md5(text.encode("utf-8")).digest()
    key = _std_file_key(user_pw, O, P, id0, R, length_bits)
    U = _std_user_check(key, id0, R)
    if R >= 3:
        U = U + bytes(16)  # 16 bytes of arbitrary padding per spec
    enc_content = _rc4(_obj_key(key, 4), content)

    V = 2 if R >= 3 else 1
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
        % (len(enc_content), enc_content),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Filter /Standard /V %d /R %d /Length %d /P %d /O <%s> /U <%s> >>"
        % (V, R, length_bits, P, O.hex().upper().encode(), U.hex().upper().encode()),
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
    idhex = id0.hex().upper().encode()
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R /Encrypt 6 0 R /ID [<%s> <%s>] >>\n"
        b"startxref\n%d\n%%%%EOF\n" % (len(objects) + 1, idhex, idhex, xref_at)
    )
    return bytes(out)
