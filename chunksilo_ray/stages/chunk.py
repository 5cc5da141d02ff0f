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

import pyarrow as pa

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


class ChunkTurns:
    """Stateless map_batches callable: assembled turn rows -> chunk rows.
    ``heading_path`` is the transcript analog of the reference's heading path:
    [role, tool] (docx_utils.py:207-225 -> SURVEY.md §1 mapping)."""

    def __init__(self, chunk_size: int = 512, chunk_overlap: int = 50):
        self.chunk_size = chunk_size
        self.chunk_overlap = chunk_overlap

    def __call__(self, t: pa.Table) -> pa.Table:
        conv_ids = t.column("conv_id").to_pylist()
        turn_idxs = t.column("turn_idx").to_pylist()
        roles = t.column("role").to_pylist()
        tools = t.column("tool").to_pylist()
        ts = t.column("ts").to_pylist()
        texts = t.column("text").to_pylist()
        doc_starts = (
            t.column("doc_char_start").to_pylist()
            if "doc_char_start" in t.column_names
            else [0] * t.num_rows
        )

        out: dict[str, list] = {c: [] for c in CHUNK_COLUMNS}
        for r in range(t.num_rows):
            pieces = chunk_text(texts[r], self.chunk_size, self.chunk_overlap)
            for k, (start, ctext) in enumerate(pieces):
                out["chunk_id"].append(f"{conv_ids[r]}#{turn_idxs[r]}#{k}")
                out["conv_id"].append(conv_ids[r])
                out["turn_idx"].append(turn_idxs[r])
                out["chunk_idx"].append(k)
                out["role"].append(roles[r])
                out["tool"].append(tools[r])
                out["ts"].append(ts[r])
                out["text"].append(ctext)
                out["start_char"].append(start)
                out["doc_char_start"].append(doc_starts[r] + start)
                out["heading_path"].append(
                    [roles[r], tools[r]] if tools[r] else [roles[r]]
                )

        return pa.table(
            {
                "chunk_id": pa.array(out["chunk_id"], pa.string()),
                "conv_id": pa.array(out["conv_id"], pa.string()),
                "turn_idx": pa.array(out["turn_idx"], pa.int32()),
                "chunk_idx": pa.array(out["chunk_idx"], pa.int32()),
                "role": pa.array(out["role"], pa.string()),
                "tool": pa.array(out["tool"], pa.string()),
                "ts": pa.array(out["ts"], pa.timestamp("us")),
                "text": pa.array(out["text"], pa.string()),
                "start_char": pa.array(out["start_char"], pa.int64()),
                "doc_char_start": pa.array(out["doc_char_start"], pa.int64()),
                "heading_path": pa.array(out["heading_path"], pa.list_(pa.string())),
            }
        )


def chunk_turns(
    assembled: Dataset, chunk_size: int = 512, chunk_overlap: int = 50, batch_size: int = 4096
) -> Dataset:
    return assembled.map_batches(
        ChunkTurns(chunk_size, chunk_overlap),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
