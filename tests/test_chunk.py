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


def test_batch_kernel_parity_with_scalar_loop():
    """ChunkTurns' vectorized batch path must emit exactly what the scalar
    per-row loop emits — same rows, same (source row, chunk_idx) order —
    across blank, fast-path, slow-path, and null-tool rows."""
    import numpy as np
    import pyarrow as pa

    from chunksilo_ray.stages.chunk import CHUNK_COLUMNS, ChunkTurns, chunk_text

    long = " ".join(
        f"word{i} extra tokens pile up here sentence {i}." for i in range(120)
    )
    rows = [
        ("c1", 0, "user", None, "short question?"),
        ("c1", 1, "assistant", "search", long),
        ("c2", 0, "user", "", "   "),          # blank -> no chunks
        ("c2", 1, "assistant", None, ""),       # empty -> no chunks
        ("c3", 0, "tool", "calc", "tiny"),
        ("c3", 1, "user", None, long + " tail of more text. " + long),
    ]
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "tool": pa.array([r[3] for r in rows], pa.string()),
            "ts": pa.array([1000 + i for i in range(len(rows))], pa.timestamp("us")),
            "text": pa.array([r[4] for r in rows], pa.string()),
            "doc_char_start": pa.array([10 * i for i in range(len(rows))], pa.int64()),
        }
    )
    ck = ChunkTurns(chunk_size=64, chunk_overlap=8)
    got = ck(t)

    # scalar oracle: the pre-vectorization per-row loop
    exp: dict[str, list] = {c: [] for c in CHUNK_COLUMNS}
    for r in range(t.num_rows):
        pieces = chunk_text(rows[r][4], 64, 8)
        for k, (start, ctext) in enumerate(pieces):
            exp["chunk_id"].append(f"{rows[r][0]}#{rows[r][1]}#{k}")
            exp["conv_id"].append(rows[r][0])
            exp["turn_idx"].append(rows[r][1])
            exp["chunk_idx"].append(k)
            exp["role"].append(rows[r][2])
            exp["tool"].append(rows[r][3])
            exp["ts"].append(1000 + r)
            exp["text"].append(ctext)
            exp["start_char"].append(start)
            exp["doc_char_start"].append(10 * r + start)
            exp["heading_path"].append(
                [rows[r][2], rows[r][3]] if rows[r][3] else [rows[r][2]]
            )
    assert got.column_names == CHUNK_COLUMNS
    for c in CHUNK_COLUMNS:
        if c == "ts":
            got_us = got[c].cast(pa.int64()).to_pylist()
            assert got_us == exp[c], c
        else:
            assert got[c].to_pylist() == exp[c], c
