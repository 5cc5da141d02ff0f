"""Chunker unit tests (mirrors reference test_chunk_location.py layer)."""

from chunksilo_ray.stages.chunk import chunk_text, split_sentences


def test_split_sentences_offsets():
    text = "First sentence. Second one! Third?"
    sents = split_sentences(text)
    assert [s for _, s in sents] == ["First sentence.", " Second one!", " Third?"]
    for start, s in sents:
        assert text[start : start + len(s)] == s


def test_single_chunk_when_small():
    text = "Short text. Nothing to split."
    assert chunk_text(text, chunk_size=512, chunk_overlap=50) == [(0, text)]


def test_chunks_cover_text_with_overlap():
    sentences = [f"Sentence number {i} has exactly six words." for i in range(40)]
    text = " ".join(sentences)
    chunks = chunk_text(text, chunk_size=50, chunk_overlap=10)
    assert len(chunks) > 1
    # every chunk substring matches its offset
    for start, ctext in chunks:
        assert text[start : start + len(ctext)] == ctext
    # full coverage: first chunk starts at 0, last chunk reaches the end
    assert chunks[0][0] == 0
    last_start, last_text = chunks[-1]
    assert last_start + len(last_text) == len(text)
    # successive chunks overlap (trailing-sentence overlap >= 1 sentence)
    for (s1, t1), (s2, _) in zip(chunks, chunks[1:]):
        assert s2 < s1 + len(t1)
        assert s2 > s1  # but always advance


def test_oversized_sentence_is_own_chunk():
    text = "word " * 100 + ". tail sentence."
    chunks = chunk_text(text.strip(), chunk_size=10, chunk_overlap=2)
    assert len(chunks) >= 1  # never split mid-sentence, never infinite-loop


def test_chunk_determinism():
    text = " ".join(f"Deterministic sentence {i}." for i in range(100))
    a = chunk_text(text, 30, 5)
    b = chunk_text(text, 30, 5)
    assert a == b
