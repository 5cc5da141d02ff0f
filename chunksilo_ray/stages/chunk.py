"""Sentence-window chunking as a stateless Arrow map_batches stage.

From-scratch re-implementation of the reference's chunking *semantics*
(reference src/chunksilo/index.py:1471-1476: SentenceSplitter(chunk_size,
chunk_overlap) over per-section documents, nodes carry ``start_char_idx``):
split text into sentences, pack sentences greedily into windows of at most
``chunk_size`` tokens, overlap successive windows by >= ``chunk_overlap``
tokens of trailing sentences. Token = whitespace word (the reference counts
model tokens; the packing algorithm, not the token dialect, is the spec).

Documents here are per-turn (the transcript analog of the reference's
per-heading sections, SURVEY.md §1). Chunk windows therefore never span
turns — the partitioning assumption that keeps this stage embarrassingly
parallel at any scale. A sentence longer than chunk_size becomes its own
chunk (never split mid-sentence; mirrors SentenceSplitter's fallback).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

# sentence boundary: ., !, ? or newline followed by whitespace/end.
_SENT_RE = re.compile(r"[^.!?\n]*(?:[.!?]+|\n+|$)")
_WORD_RE = re.compile(r"\S+")

CHUNK_COLUMNS = [
    "chunk_id",
    "conv_id",
    "turn_idx",
    "chunk_idx",
    "role",
    "tool",
    "ts",
    "text",
    "start_char",
    "doc_char_start",
    "heading_path",
]


def split_sentences(text: str) -> list[tuple[int, str]]:
    """(start_char, sentence) pairs covering the text; empties dropped."""
    out: list[tuple[int, str]] = []
    for m in _SENT_RE.finditer(text):
        s = m.group(0)
        if s.strip():
            out.append((m.start(), s))
        if m.end() == len(text):
            break
    return out


def chunk_text(text: str, chunk_size: int, chunk_overlap: int) -> list[tuple[int, str]]:
    """Greedy sentence packing with trailing-sentence overlap.
    Returns [(start_char, chunk_text)]; start_char indexes into ``text``."""
    # exact short-text fast path: n whitespace tokens need >= 2n-1 chars, so
    # len <= 2*chunk_size-1 guarantees token count <= chunk_size — the whole
    # turn is one chunk and the sentence/token regexes never run (the common
    # case for dialogue turns)
    if (len(text) + 1) // 2 <= chunk_size:
        return [(0, text)] if text.strip() else []
    sents = split_sentences(text)
    if not sents:
        return []
    counts = [len(_WORD_RE.findall(s)) for _, s in sents]
    if sum(counts) <= chunk_size:
        return [(0, text)]
    chunks: list[tuple[int, str]] = []
    i = 0
    n = len(sents)
    while i < n:
        j = i
        tok = 0
        while j < n and (j == i or tok + counts[j] <= chunk_size):
            tok += counts[j]
            j += 1
        start = sents[i][0]
        end = sents[j - 1][0] + len(sents[j - 1][1])
        chunks.append((start, text[start:end]))
        if j >= n:
            break
        # back off: start the next window so that >= chunk_overlap tokens of
        # trailing sentences are repeated (but always advance by >= 1 sentence)
        k = j
        otok = 0
        while k > i + 1 and otok + counts[k - 1] <= chunk_overlap:
            k -= 1
            otok += counts[k]
        i = k
    return chunks


def _heading_path(role: pa.ChunkedArray | pa.Array, tool: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized ``[role, tool] if tool else [role]`` list column: one
    combined values array + interleaved take indices, no Python per row."""
    if isinstance(role, pa.ChunkedArray):
        role = role.combine_chunks()
    if isinstance(tool, pa.ChunkedArray):
        tool = tool.combine_chunks()
    n = len(role)
    has_tool = pc.and_(tool.is_valid(), pc.not_equal(pc.fill_null(tool, ""), "")).to_numpy(
        zero_copy_only=False
    )
    counts = 1 + has_tool.astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(counts)))
    idx = np.empty(int(offsets[-1]), dtype=np.int64)
    idx[offsets[:-1]] = np.arange(n)  # role at each list head
    tool_rows = np.flatnonzero(has_tool)
    idx[offsets[:-1][tool_rows] + 1] = n + tool_rows  # tool second where present
    values = pa.concat_arrays([role.cast(pa.string()), tool.cast(pa.string())]).take(
        pa.array(idx)
    )
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), values)


def _empty_chunks() -> pa.Table:
    return pa.table(
        {
            "chunk_id": pa.array([], pa.string()),
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int32()),
            "chunk_idx": pa.array([], pa.int32()),
            "role": pa.array([], pa.string()),
            "tool": pa.array([], pa.string()),
            "ts": pa.array([], pa.timestamp("us")),
            "text": pa.array([], pa.string()),
            "start_char": pa.array([], pa.int64()),
            "doc_char_start": pa.array([], pa.int64()),
            "heading_path": pa.array([], pa.list_(pa.string())),
        }
    )


class ChunkTurns:
    """Stateless map_batches callable: assembled turn rows -> chunk rows.
    ``heading_path`` is the transcript analog of the reference's heading path:
    [role, tool] (docx_utils.py:207-225 -> SURVEY.md §1 mapping)."""

    def __init__(self, chunk_size: int = 512, chunk_overlap: int = 50):
        self.chunk_size = chunk_size
        self.chunk_overlap = chunk_overlap

    def _loop_rows(self, t: pa.Table, rows: np.ndarray) -> tuple[pa.Table, np.ndarray]:
        """Scalar chunk_text over the given row indices (long/odd texts only).
        Returns (chunk rows table, source-row index per chunk)."""
        sub = t.take(pa.array(rows))
        conv_ids = sub.column("conv_id").to_pylist()
        turn_idxs = sub.column("turn_idx").to_pylist()
        texts = sub.column("text").to_pylist()
        doc_starts = (
            sub.column("doc_char_start").to_pylist()
            if "doc_char_start" in sub.column_names
            else [0] * sub.num_rows
        )
        src: list[int] = []
        chunk_id: list[str] = []
        chunk_idx: list[int] = []
        ctexts: list[str] = []
        starts: list[int] = []
        dstarts: list[int] = []
        for r in range(sub.num_rows):
            pieces = chunk_text(texts[r], self.chunk_size, self.chunk_overlap)
            for k, (start, ctext) in enumerate(pieces):
                src.append(int(rows[r]))
                chunk_id.append(f"{conv_ids[r]}#{turn_idxs[r]}#{k}")
                chunk_idx.append(k)
                ctexts.append(ctext)
                starts.append(start)
                dstarts.append(doc_starts[r] + start)
        srcarr = np.asarray(src, dtype=np.int64)
        picked = t.take(pa.array(srcarr))
        return (
            pa.table(
                {
                    "chunk_id": pa.array(chunk_id, pa.string()),
                    "conv_id": picked["conv_id"],
                    "turn_idx": picked["turn_idx"].cast(pa.int32()),
                    "chunk_idx": pa.array(chunk_idx, pa.int32()),
                    "role": picked["role"],
                    "tool": picked["tool"],
                    "ts": picked["ts"].cast(pa.timestamp("us")),
                    "text": pa.array(ctexts, pa.string()),
                    "start_char": pa.array(starts, pa.int64()),
                    "doc_char_start": pa.array(dstarts, pa.int64()),
                    "heading_path": _heading_path(picked["role"], picked["tool"]),
                }
            ),
            srcarr,
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        """Vectorized over the dominant case: a turn short enough that the
        whole text is ONE chunk (chunk_text's exact fast path) is emitted
        straight from Arrow kernels; only long/odd rows run the scalar
        sentence packer. Output row order matches the scalar loop exactly:
        chunks sorted by (source row, chunk_idx)."""
        n = t.num_rows
        if n == 0:
            return _empty_chunks()
        text = t.column("text")
        lens = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
        blank_np = pc.equal(
            pc.utf8_length(pc.utf8_trim_whitespace(text)), 0
        ).to_numpy(zero_copy_only=False)
        # \x1c-\x1f are Python-blank but not Unicode-whitespace: route to the
        # scalar path so batch semantics match str.strip() exactly
        odd = pc.match_substring_regex(text, "[\\x1c-\\x1f]").to_numpy(zero_copy_only=False)
        fast_np = (lens <= 2 * self.chunk_size - 1) & ~blank_np & ~odd
        slow_rows = np.flatnonzero(~fast_np & ~(blank_np & ~odd))

        fast_idx = np.flatnonzero(fast_np)
        ftab = t.take(pa.array(fast_idx))
        cid = pc.binary_join_element_wise(
            pc.cast(ftab["conv_id"], pa.string()),
            pc.cast(ftab["turn_idx"], pa.string()),
            pa.scalar("0"),
            "#",
        )
        nfast = len(fast_idx)
        doc_start = (
            ftab["doc_char_start"].cast(pa.int64())
            if "doc_char_start" in ftab.column_names
            else pa.array(np.zeros(nfast, np.int64))
        )
        fast_out = pa.table(
            {
                "chunk_id": cid,
                "conv_id": ftab["conv_id"],
                "turn_idx": ftab["turn_idx"].cast(pa.int32()),
                "chunk_idx": pa.array(np.zeros(nfast, np.int32)),
                "role": ftab["role"],
                "tool": ftab["tool"],
                "ts": ftab["ts"].cast(pa.timestamp("us")),
                "text": ftab["text"],
                "start_char": pa.array(np.zeros(nfast, np.int64)),
                "doc_char_start": doc_start,
                "heading_path": _heading_path(ftab["role"], ftab["tool"]),
            }
        )
        if len(slow_rows) == 0:
            return fast_out  # already in source-row order

        slow_out, slow_src = self._loop_rows(t, slow_rows)
        merged = pa.concat_tables([fast_out, slow_out])
        # restore (source row, chunk_idx) order across the two parts
        src_all = np.concatenate([fast_idx, slow_src])
        kidx = np.concatenate(
            [np.zeros(nfast, np.int64), np.asarray(slow_out["chunk_idx"].to_numpy(zero_copy_only=False), np.int64)]
        )
        order = np.lexsort((kidx, src_all))
        return merged.take(pa.array(order))


def chunk_turns(
    assembled: Dataset, chunk_size: int = 512, chunk_overlap: int = 50, batch_size: int = 4096
) -> Dataset:
    return assembled.map_batches(
        ChunkTurns(chunk_size, chunk_overlap),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
