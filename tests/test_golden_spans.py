"""Golden per-document span-sequence tests (the north-rule invariant).

``tests/golden_spans.json`` holds the hand-verified expected output for every
fixture document — derived from the reference semantics in SURVEY.md §2 (and
cross-checked against the actual reference code by
``test_differential_ref.py``).  Exact ``(kind, text, media_ref, order)``
equality, order included.
"""

from __future__ import annotations

import json
import os

import pytest

from table_extractor_spark.kernel.document import extract_document
from table_extractor_spark.sources.corpus import fixture_documents, replicate

GOLDEN = json.load(
    open(os.path.join(os.path.dirname(__file__), "golden_spans.json"), encoding="utf-8")
)
DOCS = dict(fixture_documents())


@pytest.mark.parametrize("doc_id", [d for d in GOLDEN if d != "soccer_mega"])
def test_golden_span_sequence(doc_id):
    out, metrics = extract_document(doc_id, DOCS[doc_id])
    expected = GOLDEN[doc_id]
    assert [list(r) for r in out] == expected["spans"]
    assert metrics == expected["metrics"]


def test_mega_doc_counts():
    out, metrics = extract_document("soccer_mega", DOCS["soccer_mega"])
    g = GOLDEN["soccer_mega"]
    assert len(out) == g["spans_len"]
    assert [list(r) for r in out[:8]] == g["first"]
    assert [list(r) for r in out[-4:]] == g["last"]
    assert metrics == g["metrics"]


def test_replication_is_doc_pure():
    # a replicated doc (new doc_id, same spans) yields the original's output —
    # the kernel must be a pure function of (doc_id, spans); doc_id only feeds
    # the section fallback, which no replicated fixture relies on when it has
    # a preceding heading.
    base = dict(fixture_documents())
    reps = replicate(list(base.items())[:1], 2)
    (d0, s0), (d1, s1) = reps
    assert extract_document(d0, s0)[0] == extract_document(d1, s1)[0]


def test_spot_checks_hand_derived():
    """A few fully hand-written expectations, independent of the JSON file."""
    out, _ = extract_document("soccer_rowspan", DOCS["soccer_rowspan"])
    # rowspan header fills DOWN with a blank copy -> flatten keeps 'Year' alone
    assert [r[:3] for r in out] == [
        ("section", "Club career", ""),
        ("header", "Year", ""),
        ("header", "Apps - Goals", ""),
        ("cell", "2002.0", ""),
        ("cell", "7.0", ""),
    ]
    out, _ = extract_document("actor_anchors", DOCS["actor_anchors"])
    assert ("link", "Pulp_Fiction", "", 6) in out
    assert ("cell", "Premiere photo", "img://actor_anchors/0.jpg", 10) in out
    assert ("media", "Premiere photo", "img://actor_anchors/0.jpg", 11) in out
    out, _ = extract_document("soccer_accents_Pelé", DOCS["soccer_accents_Pelé"])
    # fallback section folds accents (bytes path); heading section keeps them
    assert out[0] == ("section", "soccer accents Pele", "", 0)
    assert ("section", "Títulos conquistados", "", 3) in out
    # header ascii-replace turns 'ã' into '.', data keeps accents
    assert ("header", "Campe.o", "", 4) in out
    assert ("cell", "Pelé", "", 5) in out
