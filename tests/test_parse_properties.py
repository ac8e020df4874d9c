"""Property-based tests of the frozen parse contract (hypothesis).

Random payloads → invariants that must hold for ANY input: dense
offsets, per-page kind ordering, threshold rules, determinism, and
pack/explode round-trip stability.
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from agentic_rag_for_multi_model_pdf_extraction_ray.parsing import parse_payload
from agentic_rag_for_multi_model_pdf_extraction_ray.schema import (
    MIN_FIGURE_PX,
    MIN_TEXT_LEN,
)

_text_line = st.text(
    alphabet=string.ascii_letters + string.digits + " .,",
    min_size=0, max_size=120,
)
_table_line = st.builds(
    lambda cells: "| " + " | ".join(cells) + " |",
    st.lists(st.text(alphabet=string.ascii_letters, min_size=0, max_size=8),
             min_size=1, max_size=5),
)
_img_line = st.builds(
    lambda ref, w, h: f'<img src="crop://x/{ref}" width="{w}" height="{h}"/>',
    st.integers(0, 99), st.integers(1, 300), st.integers(1, 300),
)
_nav_line = st.just('<nav><a href="/">home</a></nav>')
_line = st.one_of(_text_line, _table_line, _img_line, _nav_line)
_page = st.builds("\n".join, st.lists(_line, min_size=0, max_size=12))
_payload = st.builds("\f".join, st.lists(_page, min_size=1, max_size=4))

KIND_RANK = {"table": 0, "figure": 1, "text": 2}


@settings(max_examples=200, deadline=None)
@given(_payload)
def test_parse_invariants(payload):
    spans = parse_payload(payload)

    # determinism
    assert spans == parse_payload(payload)

    # offsets dense 0..n-1
    assert [s.offset for s in spans] == list(range(len(spans)))

    # page numbers non-decreasing; within a page kinds ordered
    # tables -> figures -> text, at most one text span per page
    last_page = 0
    for i in range(1, len(spans)):
        a, b = spans[i - 1], spans[i]
        assert b.page_num >= a.page_num
        if a.page_num == b.page_num:
            assert KIND_RANK[a.kind] <= KIND_RANK[b.kind]
    for page in {s.page_num for s in spans}:
        texts = [s for s in spans if s.page_num == page and s.kind == "text"]
        assert len(texts) <= 1
        if texts:
            assert len(texts[0].text) >= MIN_TEXT_LEN
        assert page >= last_page

    for s in spans:
        if s.kind == "figure":
            assert s.media_ref.startswith("crop://")
            assert s.text == ""
        else:
            assert s.media_ref == ""
        if s.kind == "table":
            lines = s.text.split("\n")
            assert len(lines) >= 3  # header + separator + >=1 body row
            assert lines[1].replace("|", "").replace("-", "").strip() == ""


@settings(max_examples=100, deadline=None)
@given(_payload)
def test_figure_size_rule(payload):
    spans = parse_payload(payload)
    # every surviving figure's declared dims in the payload are >= 80:
    # reconstruct from the payload's img tags in order
    import re

    tags = re.findall(r'<img src="([^"]*)" width="(\d+)" height="(\d+)"', payload)
    kept = {ref for ref, w, h in tags
            if int(w) >= MIN_FIGURE_PX and int(h) >= MIN_FIGURE_PX}
    got = {s.media_ref for s in spans if s.kind == "figure"}
    assert got <= kept
