"""Property-based kernel tests (hypothesis): no input may crash the kernel,
and structural invariants must hold for arbitrary tag soup."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from table_extractor_spark.kernel.document import (
    extract_document,
    extract_document_flat,
)
from table_extractor_spark.kernel.htmlmini import parse_fragment
from table_extractor_spark.kernel.pyfloat import (
    parser_is_float,
    py2_is_float,
    py2_is_int,
)

# ---------------------------------------------------------------------------
# pyfloat: the fast-reject path must agree with ground-truth float()/int()
# ---------------------------------------------------------------------------

float_ish = st.text(
    alphabet="0123456789+-.eEناin fNIy_,\t ٠", min_size=0, max_size=12
)


@given(float_ish)
@settings(max_examples=300, deadline=None)
def test_pyfloat_matches_python_float(s):
    def truth_float(v):
        if "_" in v:
            return False
        try:
            float(v)
            return True
        except (TypeError, ValueError):
            return False

    def truth_int(v):
        if "_" in v:
            return False
        try:
            int(v)
            return True
        except (TypeError, ValueError):
            return False

    assert py2_is_float(s) == truth_float(s)
    assert parser_is_float(s) == truth_float(s)
    assert py2_is_int(s) == truth_int(s)


# ---------------------------------------------------------------------------
# htmlmini: arbitrary soup never crashes; text content is preserved
# ---------------------------------------------------------------------------

soup = st.text(
    alphabet=st.sampled_from(list("<>/abctdrh='\" 123&;\nä")), max_size=200
)


@given(soup)
@settings(max_examples=300, deadline=None)
def test_parse_fragment_total(markup):
    root = parse_fragment(markup)  # must not raise
    # text outside any tag-like region survives into the tree
    for chunk in root.itertext():
        assert isinstance(chunk, str)


# ---------------------------------------------------------------------------
# grid/document: random wikitables keep the output invariants
# ---------------------------------------------------------------------------

cell_text = st.text(
    alphabet=st.sampled_from(list("ab1. -&é\n []'")), max_size=8
)
span_attr = st.sampled_from(["", ' rowspan="2"', ' colspan="2"', ' colspan="x"'])


@st.composite
def wikitable(draw):
    n_rows = draw(st.integers(1, 5))
    n_cols = draw(st.integers(1, 4))
    n_header_rows = draw(st.integers(0, 2))
    rows = []
    for r in range(n_rows):
        tag = "th" if r < n_header_rows else draw(st.sampled_from(["td", "th"]))
        cells = []
        for _c in range(n_cols):
            txt = draw(cell_text)
            attr = draw(span_attr)
            cells.append(f"<{tag}{attr}>{txt}</{tag}>")
        rows.append("<tr>" + "".join(cells) + "</tr>")
    cls = draw(
        st.sampled_from(
            ["wikitable", "wikitable sortable", "wikitable fancy", "navbox"]
        )
    )
    return f'<table class="{cls}">' + "".join(rows) + "</table>"


@given(st.lists(wikitable(), min_size=1, max_size=3), st.text(max_size=10))
@settings(max_examples=150, deadline=None)
def test_extract_document_invariants(tables, heading):
    spans = [
        {"kind": "heading", "text": heading, "media_ref": "", "offset": 0},
        {"kind": "text", "text": " ".join(tables), "media_ref": "", "offset": 1},
    ]
    out, metrics = extract_document("prop_doc", spans)

    # 1. total function, deterministic
    out2, metrics2 = extract_document("prop_doc", spans)
    assert out == out2 and metrics == metrics2

    # 2. orders are exactly 0..n-1 (output order is data, O2)
    assert [o[3] for o in out] == list(range(len(out)))

    # 3. flat form is consistent with the tuple form
    k, t, r, m3 = extract_document_flat("prop_doc", spans)
    assert [(a, b, c) for a, b, c, _ in out] == list(zip(k, t, r))
    assert m3 == metrics

    # 4. metric sanity
    assert metrics["tables_analyzed"] <= metrics["tables_num"]
    assert all(v >= 0 for v in metrics.values())

    # 5. every emitted span kind is from the contract
    assert {o[0] for o in out} <= {"section", "header", "cell", "link", "media"}
