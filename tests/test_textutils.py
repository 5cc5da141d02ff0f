"""Unit tests for scalar text/date operators (mirrors the reference's
test_utils.py / test_chunk_location.py layers, SURVEY.md §5.1)."""

import math

import numpy as np
import pytest

from chunksilo_ray.functions import dates, textutils as tu


class TestTokenizeSurface:
    def test_delimiters(self):
        assert tu.tokenize_surface("my_file-name.v2 txt") == ["my", "file", "name", "v2", "txt"]

    def test_camel_case(self):
        assert tu.tokenize_surface("ApiGateway") == ["api", "gateway"]
        assert tu.tokenize_surface("HTTPServer") == ["http", "server"]

    def test_all_caps_with_underscore(self):
        assert tu.tokenize_surface("DATABASE_URL") == ["database", "url"]

    def test_empty(self):
        assert tu.tokenize_surface("") == []
        assert tu.tokenize_surface("---") == []


class TestNormalizeSurface:
    def test_id_like(self):
        assert tu.normalize_surface("PROJ-1234") == "proj-1234"
        assert tu.normalize_surface("proj 1234") == "proj-1234"
        assert tu.normalize_surface("proj_1234") == "proj-1234"
        assert tu.normalize_surface("Proj1234") == "proj-1234"

    def test_token_join(self):
        assert tu.normalize_surface("data-base") == "data-base"
        assert tu.normalize_surface("DataBase") == "data-base"
        assert tu.normalize_surface("config.yaml") == "config-yaml"


class TestQueryPreprocess:
    def test_whitespace_and_punct(self):
        assert tu.preprocess_query("  what   is  this?? ") == "what is this"

    def test_quoted_phrases(self):
        phrases, rest = tu.extract_quoted_phrases('find "exact phrase" in "another one" docs')
        assert phrases == ["exact phrase", "another one"]
        assert rest == "find in docs"


class TestLineOffsets:
    def test_offsets_start_zero(self):
        assert tu.compute_line_offsets("ab\ncd\ne") == [0, 3, 6]

    def test_no_newline(self):
        assert tu.compute_line_offsets("abc") == [0]

    def test_offset_to_line(self):
        offs = tu.compute_line_offsets("ab\ncd\ne")
        assert tu.char_offset_to_line(offs, 0) == 1
        assert tu.char_offset_to_line(offs, 2) == 1
        assert tu.char_offset_to_line(offs, 3) == 2
        assert tu.char_offset_to_line(offs, 6) == 3


class TestHeadingPath:
    def test_flat_prefix(self):
        hs = [
            {"text": "Intro", "position": 0},
            {"text": "Setup", "position": 100},
            {"text": "Usage", "position": 200},
        ]
        assert tu.build_heading_path(hs, 150) == ["Intro", "Setup"]
        assert tu.build_heading_path(hs, 0) == ["Intro"]
        assert tu.build_heading_path(hs, 500) == ["Intro", "Setup", "Usage"]


class TestDates:
    def test_tolerant_iso(self):
        assert dates.parse_iso8601_to_date("2025-03-01T12:00:00Z") == "2025-03-01"
        assert dates.parse_iso8601_to_date("2025-03-01") == "2025-03-01"
        assert dates.parse_iso8601_to_date("garbage") is None
        assert dates.parse_iso8601_to_date("2025-13-40") is None
        assert dates.parse_iso8601_to_date(None) is None

    def test_range_inclusive(self):
        assert dates.date_in_range("2025-03-01", "2025-03-01", "2025-03-01")
        assert not dates.date_in_range("2025-03-02", None, "2025-03-01")
        # undated rows are kept only when no bounds apply
        assert dates.date_in_range(None, None, None)
        assert not dates.date_in_range(None, "2025-01-01", None)

    def test_recency_boost(self):
        # age 0 -> full boost; age == half_life -> half the boost
        assert dates.recency_boost(1.0, 0, 30, 0.5) == pytest.approx(1.5)
        assert dates.recency_boost(1.0, 30, 30, 0.5) == pytest.approx(1.25)
        v = dates.recency_boost_np(np.array([1.0, 2.0]), np.array([0.0, 30.0]), 30, 0.5)
        assert v == pytest.approx([1.5, 2.5])

    def test_boost_monotone_decreasing(self):
        b = [dates.recency_boost(1.0, d, 30, 0.5) for d in range(0, 100, 10)]
        assert all(x > y for x, y in zip(b, b[1:]))
        assert all(x >= 1.0 for x in b)


class TestStopwords:
    def test_filter(self):
        assert tu.filter_stopwords(["the", "database", "a", "ok", "x"]) == ["database"]


def test_clean_syntax_spans_unwraps_highlight_spans_only():
    from chunksilo_ray.functions.textutils import clean_syntax_spans

    h = (
        '<p><span style="color: #d63384">def</span> '
        '<span class="kw">foo</span>'
        '<span class="code-line">bar</span>&amp;</p>'
    )
    # color-style and code-class spans unwrap; the plain-class span stays
    assert clean_syntax_spans(h) == '<p>def <span class="kw">foo</span>bar&amp;</p>'


def test_clean_syntax_spans_nested_and_empty():
    from chunksilo_ray.functions.textutils import clean_syntax_spans

    assert clean_syntax_spans("") == ""
    nested = '<span style="background:#fff"><span class="codehilite">x</span></span>'
    assert clean_syntax_spans(nested) == "x"
    # non-span markup passes through byte-identical, comments included
    keep = '<div id="a"><!-- c --><b>t</b></div>'
    assert clean_syntax_spans(keep) == keep
