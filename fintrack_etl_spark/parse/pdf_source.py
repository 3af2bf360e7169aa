"""S1 — binary document source: ``binaryFile`` scan → text extraction.

The reference opens each statement PDF driver-side with pdfplumber and
joins the page texts (``extractors/bb_statement.py:28-31``); every real
user hits this step first. Here the scan is a distributed
``spark.read.format("binaryFile")`` over a path glob — each file is one
row carrying (path, modificationTime, length, content) — and the
byte→text decode runs per Arrow batch inside ``mapInPandas`` with the
CODEC SLOT ISOLATED (same discipline as ``multimodal.py``): pdfplumber
is used if importable; otherwise only the deterministic ``%FAKEPDF``
envelope (fixtures/tests) decodes, and undecodable payloads surface as
``decode_error`` rows instead of failing the scan — corrupt files at
100 TB must quarantine, not kill the job.

Scale notes: binaryFile splits per FILE (a file never splits across
tasks), so millions of small PDFs parallelize naturally;
``spark.sql.files.maxPartitionBytes`` packs small files per task. The
decode emits (doc_path, text) and drops the payload immediately, so
only text crosses the next shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Deterministic fixture envelope: marker + utf-8 payload.
FAKE_PDF_MARKER = b"%FAKEPDF\n"

EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("doc_path", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def encode_fake_pdf(text_col: Column) -> Column:
    """Fixture encoder (JVM-side): wrap utf-8 text in the ``%FAKEPDF``
    envelope so the binary plumbing is exercisable without a codec."""
    return F.concat(F.lit(FAKE_PDF_MARKER), F.encode(text_col, "utf-8"))


def read_binary_docs(spark: SparkSession, path: str, glob: str = "*.pdf") -> DataFrame:
    """S1 scan: one row per file, content as an opaque binary column."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "modificationTime", "length", "content")
    )


def _decode_doc_bytes(b: bytes | None) -> tuple[str | None, str | None]:
    """The isolated codec slot: (text, error). Swap in real codecs here
    and nothing else in the pipeline changes."""
    if b is None or len(b) == 0:
        return None, "empty"
    if b.startswith(FAKE_PDF_MARKER):
        return b[len(FAKE_PDF_MARKER) :].decode("utf-8"), None
    if b.startswith(b"%PDF"):
        try:
            import pdfplumber  # preferred when available (full layout model)
        except ModuleNotFoundError:
            pdfplumber = None
        if pdfplumber is not None:
            import io

            with pdfplumber.open(io.BytesIO(b)) as doc:
                return "\n".join(page.extract_text() or "" for page in doc.pages), None
        # Fallback: bundled pure-Python extractor (uncompressed/Flate
        # text streams, Tj/TJ — see parse/minipdf.py for scope).
        from .minipdf import extract_pdf_text

        try:
            text = extract_pdf_text(b)
        except Exception as exc:  # corrupt stream must quarantine, not raise
            return None, f"pdf: extract failed: {exc}"
        if text is None:
            return None, "pdf: no text streams decodable (encrypted/CID/unsupported filter?)"
        return text, None
    return None, f"unknown format: {b[:4].hex()}"


def extract_batches(
    batches: Iterator, path_col: str = "path", content_col: str = "content"
) -> Iterator:
    """The decode kernel as a plain batch transform, exposed so callers
    that BUILD the binary payload in Python can compose
    ``extract_batches(encode(batches))`` into ONE ``mapInPandas`` pass —
    the payload then never crosses the Python↔JVM boundary at all
    (guide §4.1; the p8/p9/p10 round-trips measured ~2x on this)."""
    import pandas as pd

    for pdf_batch in batches:
        texts: list[str | None] = []
        errs: list[str | None] = []
        for b in pdf_batch[content_col]:
            t, e = _decode_doc_bytes(bytes(b) if b is not None else None)
            texts.append(t)
            errs.append(e)
        yield pd.DataFrame(
            {"doc_path": pdf_batch[path_col], "text": texts, "decode_error": errs}
        )


def binary_docs_to_text(
    df: DataFrame, path_col: str = "path", content_col: str = "content"
) -> DataFrame:
    """Arrow-batched binary→text: (doc_path, text, decode_error) — the
    adapter between the S1 scan and the line parsers
    (``parse_bb_statement`` et al. take exactly (doc_id, text))."""

    def _extract(batches: Iterator) -> Iterator:
        return extract_batches(batches, path_col, content_col)

    return df.select(path_col, content_col).mapInPandas(_extract, EXTRACT_SCHEMA)
