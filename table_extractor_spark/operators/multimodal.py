"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container ships no codec LIBRARIES (no PIL/cv2), so the gate is:
``decode_real`` uses PIL when importable, falls back to the built-in
stdlib PNG codec (``decode_png`` — written from the public PNG spec,
zlib + struct only) for PNG streams, and raises ``NotImplementedError``
for formats that genuinely need an external codec (JPEG/WebP/video).
The deterministic IMG1 fake container remains the oracle-parity path for
driver queries; ``decode_metadata_real`` / ``pixel_histogram_features``
are the real-codec twins running the identical Spark plumbing.
Everything AROUND the decode — schemas, Arrow batch shape, mapInPandas
signatures, partitioning — is shared between both paths and tested.

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


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # grey, RGB, grey+alpha, RGBA


def decode_png(content: bytes):
    """REAL image decode, stdlib only (zlib + struct), written from the
    public PNG specification (W3C PNG / RFC 2083): 8-bit-depth greyscale /
    RGB / grey+alpha / RGBA, non-interlaced, all five scanline filters
    (None, Sub, Up, Average, Paeth).  Returns ``(width, height, channels,
    pixels)`` with ``pixels`` the unfiltered samples, row-major bytes.

    Anything outside that envelope (palette, 16-bit, interlaced, torn
    stream, bad CRC length fields) raises ``ValueError`` — callers route
    those rows to the ``valid=False`` channel rather than killing a task.
    The per-row unfilter loop is sequential by spec (filters reference the
    left/up neighbor of the RECONSTRUCTED stream), so this is a small-blob
    codec: fine for thumbnails/validation at Arrow-batch granularity; a
    production pipeline swaps in a C codec behind the same signature."""
    import struct
    import zlib

    b = bytes(content)
    if not b.startswith(PNG_MAGIC):
        raise ValueError("not a PNG stream")
    pos, ihdr, idat = len(PNG_MAGIC), None, []
    while pos + 8 <= len(b):
        (length,), ctype = struct.unpack(">I", b[pos:pos + 4]), b[pos + 4:pos + 8]
        data = b[pos + 8:pos + 8 + length]
        if len(data) != length:
            raise ValueError("torn chunk")
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    width, height, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in _PNG_CHANNELS or comp or filt or interlace:
        raise ValueError(
            f"unsupported PNG shape: depth={depth} color={color} "
            f"interlace={interlace}"
        )
    ch = _PNG_CHANNELS[color]
    stride = width * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("decompressed size mismatch")
    out = bytearray(stride * height)
    prev = bytes(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                bb = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + bb - c
                pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (bb if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown filter type {ftype}")
        out[y * stride:(y + 1) * stride] = line
        prev = line
    return width, height, ch, bytes(out)


def encode_png(width: int, height: int, channels: int, pixels: bytes,
               filter_type: int = 0) -> bytes:
    """Minimal PNG encoder (the deterministic synthesizer for fixtures and
    the round-trip differential in tests): 8-bit, color type from channel
    count, one filter type applied to every row so each decoder filter
    path is exercisable."""
    import struct
    import zlib

    color = {1: 0, 3: 2, 2: 4, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer size mismatch")
    rows = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = pixels[y * stride:(y + 1) * stride]
        rows.append(filter_type)
        for i in range(stride):
            a = line[i - channels] if i >= channels else 0
            bb = prev[i]
            c = prev[i - channels] if i >= channels else 0
            if filter_type == 0:
                v = line[i]
            elif filter_type == 1:
                v = (line[i] - a) & 0xFF
            elif filter_type == 2:
                v = (line[i] - bb) & 0xFF
            elif filter_type == 3:
                v = (line[i] - ((a + bb) >> 1)) & 0xFF
            elif filter_type == 4:
                p = a + bb - c
                pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (bb if pb <= pc else c)
                v = (line[i] - pred) & 0xFF
            else:
                raise ValueError(f"unknown filter type {filter_type}")
            rows.append(v)
        prev = line

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        PNG_MAGIC + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(rows)))
        + chunk(b"IEND", b"")
    )


def decode_real(content: bytes):
    """Actual image decode: PIL when importable, else the built-in
    stdlib PNG codec above for PNG streams; every other format raises
    ``NotImplementedError`` (this container ships no JPEG/WebP codec).
    Returns ``(width, height, channels, pixels)``."""
    try:
        import io

        from PIL import Image  # pragma: no cover - no PIL in this container
    except ImportError:
        if bytes(content).startswith(PNG_MAGIC):
            return decode_png(content)
        raise NotImplementedError(
            "real decoding of non-PNG formats needs PIL/pillow, not "
            "present in this environment; PNG decodes via the stdlib "
            "codec, and the IMG1 fake-container path covers the rest"
        )
    img = Image.open(io.BytesIO(content))  # pragma: no cover
    return (  # pragma: no cover
        img.width, img.height, len(img.getbands()), img.tobytes()
    )


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


def decode_metadata_real(media: DataFrame) -> DataFrame:
    """The REAL-codec twin of ``decode_metadata``: PNG blobs decode through
    ``decode_real`` (stdlib codec, or PIL when present) into typed
    metadata; anything undecodable yields ``valid=False`` with zeroed
    metadata — poison blobs never kill a task.  Same META_SCHEMA, same
    single-mapInPandas shape, so swapping fake for real costs no plan
    change."""

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, ws, hs, nbytes, valids = [], [], [], [], []
            for c in pdf["content"]:
                try:
                    w, h, _, _ = decode_real(bytes(c))
                    fmts.append("PNG")
                    ws.append(w)
                    hs.append(h)
                    nbytes.append(len(bytes(c)))
                    valids.append(True)
                except (NotImplementedError, ValueError, TypeError):
                    fmts.append("")
                    ws.append(0)
                    hs.append(0)
                    nbytes.append(0 if c is None else len(bytes(c)))
                    valids.append(False)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "format": fmts,
                    "width": ws,
                    "height": hs,
                    "payload_bytes": nbytes,
                    "valid": valids,
                }
            )

    return media.mapInPandas(gen, schema=META_SCHEMA)


def pixel_histogram_features(media: DataFrame, bins: int = FEATURE_BINS) -> DataFrame:
    """Feature extraction over REAL decoded pixels: ``bins``-bucket
    histogram of the unfiltered sample bytes (the post-codec analogue of
    ``byte_histogram_features``, which bins the still-compressed payload).
    Undecodable blobs emit an all-zero row, so downstream joins stay
    total.  numpy-vectorized per Arrow batch after the per-blob decode."""
    import numpy as np

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": pdf["doc_id"], "media_ref": pdf["media_ref"]}
            hists = []
            for c in pdf["content"]:
                try:
                    _, _, _, pixels = decode_real(bytes(c))
                    arr = np.frombuffer(pixels, dtype="uint8")
                    hists.append(
                        np.bincount(arr // (256 // bins), minlength=bins)
                    )
                except (NotImplementedError, ValueError, TypeError):
                    hists.append(np.zeros(bins, dtype="int64"))
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


AUDIO_META_SCHEMA = (
    "doc_id string, media_ref string, format string, n_channels int, "
    "sample_rate int, n_frames long, duration_ms long, valid boolean"
)


def decode_wav_metadata(media: DataFrame) -> DataFrame:
    """REAL audio decode for RIFF/WAVE blobs via the stdlib ``wave``
    module — the audio counterpart of ``decode_metadata_real``:
    (channels, sample rate, frame count, integer-ms duration) per blob,
    undecodable rows flagged ``valid=False`` with zeroed metadata.
    Same one-mapInPandas / poison-safe shape as every decode path here;
    compressed formats (MP3/OGG/FLAC) need an external codec and land in
    the invalid channel rather than raising."""
    import io
    import wave

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, chs, rates, frames, durs, valids = [], [], [], [], [], []
            for c in pdf["content"]:
                try:
                    with wave.open(io.BytesIO(bytes(c))) as w:
                        rate = w.getframerate()
                        nfr = w.getnframes()
                        if rate <= 0:
                            raise ValueError("bad sample rate")
                        fmts.append("WAV")
                        chs.append(w.getnchannels())
                        rates.append(rate)
                        frames.append(nfr)
                        durs.append(1000 * nfr // rate)
                        valids.append(True)
                except Exception:  # wave raises bare Error/EOFError on junk
                    fmts.append("")
                    chs.append(0)
                    rates.append(0)
                    frames.append(0)
                    durs.append(0)
                    valids.append(False)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "format": fmts,
                    "n_channels": chs,
                    "sample_rate": rates,
                    "n_frames": frames,
                    "duration_ms": durs,
                    "valid": valids,
                }
            )

    return media.mapInPandas(gen, schema=AUDIO_META_SCHEMA)
