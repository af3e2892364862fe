"""Real-codec gate: the stdlib PNG decoder and its Spark twins.

The container has no PIL, so ``decode_real`` must route PNG streams
through ``decode_png`` (written from the public PNG spec) and refuse
everything else with a clear ``NotImplementedError`` — while the Spark
plumbing (`decode_metadata_real`, `pixel_histogram_features`) keeps the
exact schema/batch shape of the fake-container path.
"""

from __future__ import annotations

import pytest

from table_extractor_spark.operators.multimodal import (
    FEATURE_BINS,
    decode_metadata_real,
    decode_png,
    decode_real,
    encode_png,
    pixel_histogram_features,
)


def _pixels(w, h, ch, seed=7):
    # deterministic but non-trivial: exercises carries in every filter
    return bytes(
        (seed + 31 * x + 17 * y + 97 * c) % 256
        for y in range(h)
        for x in range(w)
        for c in range(ch)
    )


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_every_color_type_and_filter(channels, filter_type):
    """encode -> decode is the identity for all four 8-bit color types
    under each of the five PNG scanline filters (None/Sub/Up/Avg/Paeth),
    so every unfilter branch is exercised against an independent forward
    implementation of the same spec."""
    w, h = 9, 5
    px = _pixels(w, h, channels)
    blob = encode_png(w, h, channels, px, filter_type=filter_type)
    assert decode_png(blob) == (w, h, channels, px)
    # decode_real routes PNG through the stdlib codec when PIL is absent
    assert decode_real(blob)[:3] == (w, h, channels)


def test_png_decoder_rejects_out_of_envelope_streams():
    with pytest.raises(ValueError):
        decode_png(b"JFIF not a png")
    good = encode_png(4, 3, 3, _pixels(4, 3, 3))
    with pytest.raises(ValueError):
        decode_png(good[: len(good) // 2])  # torn stream
    # interlaced header: flip the interlace byte inside IHDR
    bad = bytearray(good)
    bad[8 + 8 + 12] = 1  # magic + len/type + 13th IHDR byte (interlace)
    with pytest.raises(ValueError):
        decode_png(bytes(bad))


def test_decode_real_refuses_non_png_without_pil():
    pytest.importorskip
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present; gate exercises the fallback only")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_real(b"\xff\xd8\xff\xe0 jpeg-ish bytes")


def test_decode_metadata_real_and_pixel_histogram(spark):
    """Spark twins: PNG blobs decode to typed metadata; poison blobs land
    valid=False with zeroed metadata; the pixel histogram sums to
    width*height*channels for decodable rows and to 0 for poison rows."""
    w, h, ch = 6, 4, 3
    px = _pixels(w, h, ch)
    rows = [
        ("d1", "m1", encode_png(w, h, ch, px, filter_type=4)),
        ("d2", "m2", b"not an image at all"),
        ("d3", "m3", None),
    ]
    media = spark.createDataFrame(
        rows, "doc_id string, media_ref string, content binary"
    )
    meta = {r.doc_id: r for r in decode_metadata_real(media).collect()}
    assert (meta["d1"].format, meta["d1"].width, meta["d1"].height,
            meta["d1"].valid) == ("PNG", w, h, True)
    assert meta["d1"].payload_bytes == len(rows[0][2])
    assert meta["d2"].valid is False and meta["d2"].width == 0
    assert meta["d3"].valid is False and meta["d3"].payload_bytes == 0

    feats = {r.doc_id: r for r in pixel_histogram_features(media).collect()}
    s1 = sum(feats["d1"][f"h{i}"] for i in range(FEATURE_BINS))
    assert s1 == w * h * ch
    assert sum(feats["d2"][f"h{i}"] for i in range(FEATURE_BINS)) == 0
    # exact histogram differential vs a pure-python count of the pixels
    import collections

    expect = collections.Counter(b // (256 // FEATURE_BINS) for b in px)
    got = {i: feats["d1"][f"h{i}"] for i in range(FEATURE_BINS)}
    assert got == {i: expect.get(i, 0) for i in range(FEATURE_BINS)}


def test_decode_wav_metadata_real_and_poison(spark):
    """Real RIFF/WAVE blobs (synthesized with the same stdlib module a
    producer would use) decode to typed metadata; junk and None land
    valid=False."""
    import io
    import wave

    from table_extractor_spark.operators.multimodal import (
        decode_wav_metadata,
    )

    def make_wav(channels, rate, n_frames):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(channels)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(
                bytes((i * 7) % 256 for i in range(n_frames * channels * 2))
            )
        return buf.getvalue()

    media = spark.createDataFrame(
        [
            ("a1", "m1", make_wav(1, 16000, 8000)),
            ("a2", "m2", make_wav(2, 44100, 44100)),
            ("a3", "m3", b"ID3 not a wav"),
            ("a4", "m4", None),
        ],
        "doc_id string, media_ref string, content binary",
    )
    got = {r.doc_id: r for r in decode_wav_metadata(media).collect()}
    assert (got["a1"].format, got["a1"].n_channels, got["a1"].sample_rate,
            got["a1"].n_frames, got["a1"].duration_ms, got["a1"].valid) == (
        "WAV", 1, 16000, 8000, 500, True)
    assert (got["a2"].n_channels, got["a2"].duration_ms) == (2, 1000)
    assert got["a3"].valid is False and got["a3"].sample_rate == 0
    assert got["a4"].valid is False
