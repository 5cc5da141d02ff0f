"""Property-based tests (hypothesis) — beyond the reference's test strategy
(SURVEY.md §5 notes the reference has none). Pure functions only: fast,
no Ray."""

from hypothesis import given, settings
from hypothesis import strategies as st

from chunksilo_ray import rules
from chunksilo_ray.functions.textutils import (
    compute_line_offsets,
    char_offset_to_line,
    normalize_surface,
    preprocess_query,
    tokenize_surface,
)
from chunksilo_ray.stages.chunk import chunk_text

text_st = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=400
)


class TestTokenizeProperties:
    @given(text_st)
    def test_tokens_lowercase_nonempty(self, s):
        for tok in tokenize_surface(s):
            assert tok == tok.lower()
            assert tok

    @given(text_st)
    def test_normalize_idempotent(self, s):
        n = normalize_surface(s)
        assert normalize_surface(n) == n

    @given(text_st)
    def test_preprocess_idempotent(self, s):
        q = preprocess_query(s)
        assert preprocess_query(q) == q


class TestLineOffsetProperties:
    @given(text_st)
    def test_offsets_monotone_and_cover(self, s):
        offs = compute_line_offsets(s)
        assert offs[0] == 0
        assert offs == sorted(offs)
        assert len(offs) == s.count("\n") + 1

    @given(text_st, st.integers(min_value=0, max_value=500))
    def test_line_lookup_in_range(self, s, pos):
        offs = compute_line_offsets(s)
        line = char_offset_to_line(offs, pos)
        assert 1 <= line <= len(offs)


class TestChunkProperties:
    sentences = st.lists(
        st.text(alphabet="abcdef ghij", min_size=1, max_size=40).map(
            lambda s: s.strip() + "."
        ),
        min_size=1,
        max_size=30,
    )

    @settings(max_examples=50)
    @given(sentences, st.integers(8, 64), st.integers(0, 8))
    def test_offsets_point_at_chunk_text(self, sents, size, overlap):
        text = " ".join(s for s in sents if s != ".")
        if not text.strip():
            return
        chunks = chunk_text(text, size, min(overlap, size // 2))
        for start, ctext in chunks:
            assert text[start : start + len(ctext)] == ctext
        if chunks:
            assert chunks[0][0] == 0
            last_start, last_text = chunks[-1]
            assert last_start + len(last_text) == len(text)

    @settings(max_examples=50)
    @given(sentences, st.integers(8, 64))
    def test_chunks_advance(self, sents, size):
        text = " ".join(s for s in sents if s != ".")
        if not text.strip():
            return
        chunks = chunk_text(text, size, 4)
        starts = [s for s, _ in chunks]
        assert starts == sorted(starts)
        assert len(set(starts)) == len(starts)  # strictly advancing


class TestShingleProperties:
    @given(st.text(alphabet="abcdefgh-", min_size=1, max_size=30))
    def test_jaccard_self_is_one(self, s):
        sh = rules.char_shingles(s)
        assert rules.jaccard(sh, sh) == 1.0

    @given(
        st.text(alphabet="abcdefgh", min_size=1, max_size=30),
        st.text(alphabet="abcdefgh", min_size=1, max_size=30),
    )
    def test_jaccard_symmetric_bounded(self, a, b):
        ja = rules.jaccard(rules.char_shingles(a), rules.char_shingles(b))
        jb = rules.jaccard(rules.char_shingles(b), rules.char_shingles(a))
        assert ja == jb
        assert 0.0 <= ja <= 1.0

    @given(st.text(alphabet="abcdefgh", min_size=2, max_size=30))
    def test_delimiters_ignored_in_shingles(self, s):
        mid = len(s) // 2
        with_delim = s[:mid] + "-" + s[mid:]
        assert rules.char_shingles(s) == rules.char_shingles(with_delim)
