"""Golden tests of the frozen parse contract (handwritten expectations,
independent of the shared implementation — these pin the rules
themselves; the e2e tests pin distribution-invariance)."""

from agentic_rag_for_multi_model_pdf_extraction_ray.parsing import (
    Span,
    parse_payload,
    to_markdown,
)


def test_to_markdown_matches_reference_shape():
    # reference parser.py:140-156: header, --- separator, None/empty -> ""
    md = to_markdown([["a", "b"], ["1", ""], ["", "2"]])
    assert md == "| a | b |\n| --- | --- |\n| 1 |  |\n|  | 2 |"


def test_single_page_order_tables_figures_text():
    page = "\n".join(
        [
            "<nav><a href='/'>x</a></nav>",
            "| h1 | h2 |",
            "| a | b |",
            "",
            '<img src="crop://d/0" width="100" height="90"/>',
            "This line is long enough to be definitely real main content text.",
        ]
    )
    spans = parse_payload(page)
    assert [s.kind for s in spans] == ["table", "figure", "text"]
    assert spans[0] == Span("table", "| h1 | h2 |\n| --- | --- |\n| a | b |", "", 0, 1)
    assert spans[1] == Span("figure", "", "crop://d/0", 1, 1)
    assert spans[2].offset == 2
    assert spans[2].text.startswith("This line")


def test_small_figure_dropped():
    page = '<img src="crop://d/0" width="79" height="200"/>'
    assert parse_payload(page) == []
    page = '<img src="crop://d/1" width="80" height="80"/>'
    assert [s.kind for s in parse_payload(page)] == ["figure"]


def test_single_row_table_invalid():
    # reference MIN_TABLE_ROWS=2 (parser.py:31,55)
    assert parse_payload("| only | one |") == []
    assert [s.kind for s in parse_payload("| a | b |\n| c | d |")] == ["table"]


def test_separator_rows_do_not_count():
    spans = parse_payload("| h | i |\n| --- | --- |")
    assert spans == []  # separator is formatting; only 1 real row remains
    spans = parse_payload("| h | i |\n| --- | --- |\n| x | y |")
    assert [s.kind for s in spans] == ["table"]
    assert spans[0].text == "| h | i |\n| --- | --- |\n| x | y |"


def test_min_text_len():
    # reference MIN_TEXT_LEN=40 (parser.py:32,125)
    assert parse_payload("short text") == []
    long = "x" * 40
    assert [s.kind for s in parse_payload(long)] == ["text"]


def test_boilerplate_stripped_by_tag_and_density():
    page = "\n".join(
        [
            "<footer>(c) nobody</footer>",
            '<div><a href="#a">1</a> <a href="#b">2</a> <a href="#c">3</a></div>',
            "<b>bold but mostly real text that is long enough to survive</b>",
        ]
    )
    spans = parse_payload(page)
    assert len(spans) == 1
    assert spans[0].kind == "text"
    assert spans[0].text == "bold but mostly real text that is long enough to survive"


def test_multi_page_offsets_dense_across_pages():
    p1 = "| a | b |\n| c | d |\nmain content line that is long enough to pass the filter"
    p2 = '<img src="crop://d/9" width="100" height="100"/>'
    spans = parse_payload(p1 + "\f" + p2)
    assert [(s.kind, s.offset, s.page_num) for s in spans] == [
        ("table", 0, 1),
        ("text", 1, 1),
        ("figure", 2, 2),
    ]
