"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container has no image/audio codecs, so REAL decoding is stubbed exactly
as the build brief prescribes: ``decode_real`` raises ``NotImplementedError``
unless PIL is importable, and the pipeline runs on a deterministic fake
container format instead.  Everything AROUND the decode — schemas, Arrow
batch shape, mapInPandas signatures, partitioning — is real and tested.

Fake container format (deterministic, synthesizable in pure SQL so DuckDB
can oracle-check the plumbing)::

    b"IMG1:<width>:<height>:<payload-bytes>"

Scale notes: media blobs are the widest column by far — at 100 TB you (a)
never shuffle them (decode/feature-extract BEFORE any repartition, carrying
only the extracted features across the wire), (b) read them through a
projection so parquet row groups skip the blob when a query doesn't need it,
and (c) size ``spark.sql.execution.arrow.maxRecordsPerBatch`` down so one
Arrow batch of blobs fits executor memory (10k rows x 10 MB would not).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

HEADER_PREFIX = b"IMG1:"

META_SCHEMA = (
    "doc_id string, media_ref string, format string, width int, height int, "
    "payload_bytes long, valid boolean"
)

FEATURE_BINS = 16
FEATURE_SCHEMA = (
    "doc_id string, media_ref string, "
    + ", ".join(f"h{i} long" for i in range(FEATURE_BINS))
)


def decode_real(content: bytes):
    """Actual image decode — unavailable in this container (no codec libs).

    Gated behind an import-try per the environment contract; the fake-format
    path below exercises the identical Spark plumbing."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - no PIL in this container
        raise NotImplementedError(
            "real image decoding needs PIL/pillow, not present in this "
            "environment; use the IMG1 fake-container path"
        ) from exc
    import io

    from PIL import Image

    return Image.open(io.BytesIO(content))  # pragma: no cover


def parse_fake_header(content) -> tuple:
    """(format, width, height, payload_bytes, valid) from an IMG1 container.

    Malformed blobs yield valid=False with zeroed metadata — never raise:
    at 10^12 docs a poison blob must not kill a task."""
    if content is None:
        return ("", 0, 0, 0, False)
    b = bytes(content)
    if not b.startswith(HEADER_PREFIX):
        return ("", 0, 0, len(b), False)
    parts = b.split(b":", 3)
    if len(parts) != 4:
        return ("IMG1", 0, 0, 0, False)
    try:
        width, height = int(parts[1]), int(parts[2])
    except ValueError:
        return ("IMG1", 0, 0, 0, False)
    return ("IMG1", width, height, len(parts[3]), True)


def decode_metadata(media: DataFrame) -> DataFrame:
    """(doc_id, media_ref, content) -> typed metadata via ONE mapInPandas.

    Plumbing identical to a real decoder: binary column in, struct-ish
    columns out, one Arrow batch at a time, no shuffle."""

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [parse_fake_header(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "format": [m[0] for m in meta],
                    "width": [m[1] for m in meta],
                    "height": [m[2] for m in meta],
                    "payload_bytes": [m[3] for m in meta],
                    "valid": [m[4] for m in meta],
                }
            )

    return media.mapInPandas(gen, schema=META_SCHEMA)


def byte_histogram_features(media: DataFrame, bins: int = FEATURE_BINS) -> DataFrame:
    """Feature extraction: ``bins``-bucket byte histogram of the payload.

    This is the real (non-stub) stand-in for an embedding/feature model:
    numpy-vectorized per Arrow batch — the exact batch shape a Torch/ONNX
    forward pass would consume."""
    import numpy as np

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": pdf["doc_id"], "media_ref": pdf["media_ref"]}
            hists = []
            for c in pdf["content"]:
                _, _, _, _, valid = parse_fake_header(c)
                if not valid:
                    hists.append(np.zeros(bins, dtype="int64"))
                    continue
                payload = np.frombuffer(bytes(c).split(b":", 3)[3], dtype="uint8")
                hists.append(np.bincount(payload % bins, minlength=bins))
            stacked = (
                np.stack(hists) if hists else np.zeros((0, bins), dtype="int64")
            )
            for i in range(bins):
                out[f"h{i}"] = stacked[:, i]
            yield pd.DataFrame(out)

    return media.mapInPandas(gen, schema=FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """'Resize' by rewriting the fake container header (payload untouched) —
    the real pixel work is what PIL would do; the binary-in/binary-out
    mapInPandas plumbing is the part that matters at the Spark layer."""

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_content = []
            for c in pdf["content"]:
                _, _, _, _, valid = parse_fake_header(c)
                if not valid:
                    out_content.append(None)
                    continue
                payload = bytes(c).split(b":", 3)[3]
                out_content.append(
                    b"IMG1:%d:%d:" % (width, height) + payload
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "content": out_content,
                }
            )

    return media.mapInPandas(
        gen, schema="doc_id string, media_ref string, content binary"
    )


def frame_sample_stub(media: DataFrame, every: int = 4) -> DataFrame:
    """'Video' frame sampling: keep every ``every``-th payload byte — the
    strided-read plumbing of real frame extraction, minus the codec."""

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            counts = []
            for c in pdf["content"]:
                _, _, _, _, valid = parse_fake_header(c)
                if not valid:
                    frames.append(None)
                    counts.append(0)
                    continue
                payload = bytes(c).split(b":", 3)[3]
                sampled = payload[::every]
                frames.append(sampled)
                counts.append(len(sampled))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "frames": frames,
                    "n_frames": counts,
                }
            )

    return media.mapInPandas(
        gen,
        schema="doc_id string, media_ref string, frames binary, n_frames int",
    )


PDF_PREFIX = b"PDF1:"
PAGE_SCHEMA = (
    "doc_id string, media_ref string, page_no int, title string, "
    "body string, n_words int"
)


def parse_pdf_pages(media: DataFrame) -> DataFrame:
    """PDF/layout parse (north-rule phrase), stubbed codec + real plumbing.

    Real PDF text extraction needs a parser library this container lacks;
    the fake container ``PDF1:<page>\\x0c<page>...`` (form-feed-separated
    pages, first line of a page = its heading — the layout heuristic real
    extractors apply to untagged PDFs) exercises the identical Spark
    surface: binary in, EXPLODED page rows out of one mapInPandas (a
    100-page doc becomes 100 rows without a JVM-side explode), malformed
    blobs dropped with no task failure.  Swap ``_pages_from_payload`` for a
    pdfminer/pypdf call and nothing else changes."""

    def _pages_from_payload(b: bytes):
        return bytes(b[len(PDF_PREFIX):]).decode("utf-8", "replace").split("\x0c")

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, refs, nos, titles, bodies, counts = [], [], [], [], [], []
            for did, ref, c in zip(pdf["doc_id"], pdf["media_ref"], pdf["content"]):
                if c is None or not bytes(c).startswith(PDF_PREFIX):
                    continue  # poison blob: skipped, never raises
                for i, page in enumerate(_pages_from_payload(c)):
                    lines = page.split("\n")
                    title = lines[0].strip()
                    body = "\n".join(lines[1:])
                    doc_ids.append(did)
                    refs.append(ref)
                    nos.append(i)
                    titles.append(title)
                    bodies.append(body)
                    counts.append(sum(1 for w in page.split() if w))
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "media_ref": refs,
                    "page_no": nos,
                    "title": titles,
                    "body": bodies,
                    "n_words": counts,
                }
            )

    return media.mapInPandas(gen, schema=PAGE_SCHEMA)


def synthesize_pdfs(docs: DataFrame) -> DataFrame:
    """Deterministic fake-PDF table from the documents table, pure SQL (so
    the DuckDB oracle can rebuild it): two pages per doc, page = heading
    line + a words line."""
    words = F.split(F.col("text"), " ")
    did = F.col("doc_id").cast("string")
    page1 = F.concat(
        F.lit("Intro "), did, F.lit("\n"),
        F.array_join(F.slice(words, 1, 12), " "),
    )
    page2 = F.concat(
        F.lit("Details "), did, F.lit("\n"),
        F.array_join(F.slice(words, 13, 12), " "),
    )
    return docs.select(
        did.alias("doc_id"),
        F.concat(F.lit("pdf://"), did, F.lit("/doc.pdf")).alias("media_ref"),
        F.concat(
            F.lit("PDF1:"), page1, F.lit("\x0c"), page2
        ).cast("binary").alias("content"),
    )


EMBED_DIM = 16


def embed_stub(media: DataFrame, dim: int = EMBED_DIM) -> DataFrame:
    """Media 'embedding' model stub: L2-normalized byte-histogram vector.

    The real thing is a Torch/ONNX forward pass over decoded pixels; what the
    Spark layer must get right — and what this exercises for real — is the
    batch shape (one numpy matrix per Arrow batch through mapInPandas), the
    output column type (array<double>, ANN-ready), and decode-before-shuffle
    placement.  Deterministic and SQL-derivable, so the DuckDB oracle can
    recompute the vectors exactly."""
    import numpy as np

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for c in pdf["content"]:
                _, _, _, _, valid = parse_fake_header(c)
                if not valid:
                    vecs.append(None)
                    continue
                payload = np.frombuffer(bytes(c).split(b":", 3)[3], dtype="uint8")
                hist = np.bincount(payload % dim, minlength=dim).astype("float64")
                n = float(np.sqrt((hist * hist).sum()))
                vecs.append((hist / n).tolist() if n > 0 else hist.tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "embedding": vecs,
                }
            )

    return media.mapInPandas(
        gen, schema="doc_id string, media_ref string, embedding array<double>"
    )


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake-media table from the documents table, in pure SQL
    (so the DuckDB oracle can rebuild it): width/height derived from doc_id,
    payload = the document text bytes."""
    w = (F.col("doc_id") % 64 + 16).cast("int")
    h = (F.col("doc_id") % 48 + 9).cast("int")
    did = F.col("doc_id").cast("string")
    return docs.select(
        did.alias("doc_id"),
        F.concat(F.lit("img://"), did, F.lit("/0.jpg")).alias("media_ref"),
        F.concat(
            F.lit("IMG1:"), w.cast("string"), F.lit(":"), h.cast("string"),
            F.lit(":"), F.col("text"),
        ).cast("binary").alias("content"),
    )
