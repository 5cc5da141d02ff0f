"""Dialogue assembly: global sort(conv_id, turn_idx) + vectorized reassembly.

The Ray-Data analog of the reference's heading-aware document splitting
(reference src/chunksilo/docx_utils.py:118-285: group body under ordered
headings -> per-section documents): restore turn order per conversation and
compute each turn's character offset inside the assembled conversation
document ("<role>: <text>\n" per turn).

Per the north rule, the per-turn ``text`` column passes through BYTE-EQUAL —
assembly adds ordering/offset columns, it never rewrites text.

Scale design (round 2 — replaces the round-1 groupby+map_groups):

- ONE global ``sort(conv_id, turn_idx)`` is the only shuffle. Range
  partitioning splits by row count, never by key, so a pathological
  million-turn conversation simply spans several blocks — skew cannot
  concentrate on one reducer and no salting is needed (the north rule's
  "salted repartitioning" concern is discharged by the sort itself; the
  ``salt_threshold`` knob is kept for config/fingerprint compatibility).
- Per-turn offsets are then computed in ``map_batches`` with NumPy segmented
  cumulative sums — zero per-group Python calls (the round-1
  ``map_groups`` paid one UDF invocation per conversation, the dominant
  cost at 15k+ conversations per shard).
- Conversations that span block boundaries are stitched exactly like the
  round-1 salted windows: one cheap scan over the pinned sorted blocks
  emits a tiny per-(block-fragment) header table, the driver computes each
  fragment's base offset + the conversation's total turn count, and the
  final vectorized pass patches only fragmented conversations' rows.
  Fragment count is O(#blocks), never O(#conversations)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

# assembled-turn output schema (per-turn rows, conversation-ordered)
ASSEMBLED_COLUMNS = [
    "conv_id",
    "turn_idx",
    "role",
    "text",
    "tool",
    "ts",
    "conv_n_turns",
    "doc_char_start",
]


def _prep_batch(t: pa.Table) -> pa.Table:
    # per-turn contribution to the assembled doc: len(role) + ": " + len(text) + "\n"
    contrib = pc.add(
        pc.add(pc.utf8_length(t["role"]), pc.utf8_length(t["text"])),
        pa.scalar(3, pa.int32()),
    )
    return t.append_column("contrib_len", pc.cast(contrib, pa.int64()))


def _segments(conv: pa.Array) -> np.ndarray:
    """Start indices of equal-conv_id runs in a sorted column (always
    includes 0)."""
    if len(conv) == 0:
        return np.zeros(0, dtype=np.int64)
    if isinstance(conv, pa.ChunkedArray):
        conv = conv.combine_chunks()
    neq = pc.not_equal(conv.slice(1), conv.slice(0, len(conv) - 1))
    changes = np.flatnonzero(neq.to_numpy(zero_copy_only=False))
    return np.concatenate(([0], changes + 1)).astype(np.int64)


_HEADER_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("first_turn", pa.int64()),
        ("frag_total", pa.int64()),
        ("frag_n", pa.int64()),
    ]
)


def _fragment_headers(t: pa.Table) -> pa.Table:
    """Per-block fragment summary: one row per conv_id run in the block.
    Only runs touching a block edge can belong to a fragmented conversation;
    emitting all runs would make the header table O(#conversations), so this
    emits just the first and last run of the block (2 rows per block)."""
    n = t.num_rows
    if n == 0:
        return _HEADER_SCHEMA.empty_table()
    starts = _segments(t["conv_id"])
    ends = np.concatenate((starts[1:], [n])).astype(np.int64)
    contrib = t["contrib_len"].to_numpy(zero_copy_only=False)
    csum = np.concatenate(([0], np.cumsum(contrib)))
    turn = t["turn_idx"].to_numpy(zero_copy_only=False)

    keep = [0] if len(starts) == 1 else [0, len(starts) - 1]
    rows = {
        "conv_id": t["conv_id"].take(pa.array(starts[keep])),
        "first_turn": pa.array(turn[starts[keep]].astype(np.int64)),
        "frag_total": pa.array(csum[ends[keep]] - csum[starts[keep]]),
        "frag_n": pa.array(ends[keep] - starts[keep]),
    }
    return pa.table(rows, schema=_HEADER_SCHEMA)


def _collect_bases(sorted_local: Dataset) -> dict[tuple[str, int], tuple[int, int]]:
    """{(conv_id, fragment_first_turn): (base_char_offset, conv_total_turns)}
    for conversations split across block boundaries. Header volume is two
    rows per block — O(#blocks), independent of corpus shape."""
    rows = sorted_local.map_batches(
        _fragment_headers, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).take_all()
    by_conv: dict[str, list[dict]] = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r)
    bases: dict[tuple[str, int], tuple[int, int]] = {}
    for conv_id, frags in by_conv.items():
        # a conversation is fragmented iff it produced >1 header row, or its
        # single edge-touching header is open on a side with a neighbor block
        # (which then also emitted a header for it) — so >1 rows is the test
        if len(frags) <= 1:
            continue
        frags.sort(key=lambda r: r["first_turn"])
        total_turns = sum(f["frag_n"] for f in frags)
        acc = 0
        for f in frags:
            bases[(conv_id, f["first_turn"])] = (acc, total_turns)
            acc += f["frag_total"]
    return bases


def _finalize_fn(bases: dict[tuple[str, int], tuple[int, int]]):
    frag_convs = {c for c, _ in bases}

    def finalize(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            t = t.append_column("conv_n_turns", pa.array([], pa.int32()))
            t = t.append_column("doc_char_start", pa.array([], pa.int64()))
            return t.select(ASSEMBLED_COLUMNS)
        starts = _segments(t["conv_id"])
        ends = np.concatenate((starts[1:], [n])).astype(np.int64)
        seg_len = ends - starts
        seg_id = np.repeat(np.arange(len(starts)), seg_len)

        contrib = t["contrib_len"].to_numpy(zero_copy_only=False)
        excl = np.concatenate(([0], np.cumsum(contrib[:-1])))
        local = excl - excl[starts][seg_id]  # within-run exclusive cumsum
        role_len = pc.utf8_length(t["role"]).to_numpy(zero_copy_only=False)
        doc_start = local + role_len + 2
        n_turns = seg_len[seg_id]

        if frag_convs:
            conv_at_start = t["conv_id"].take(pa.array(starts)).to_pylist()
            turn = t["turn_idx"].to_numpy(zero_copy_only=False)
            for k, cid in enumerate(conv_at_start):
                if cid in frag_convs:
                    hit = bases.get((cid, int(turn[starts[k]])))
                    if hit is not None:
                        base, total = hit
                        doc_start[starts[k] : ends[k]] += base
                        n_turns[starts[k] : ends[k]] = total

        t = t.append_column("conv_n_turns", pa.array(n_turns.astype(np.int32)))
        t = t.append_column("doc_char_start", pa.array(doc_start, pa.int64()))
        return t.select(ASSEMBLED_COLUMNS)

    return finalize


def assemble_dialogues(turns: Dataset, salt_threshold: int = 512) -> Dataset:
    """SHUFFLE #1 of the KG pipeline (SURVEY.md §3.4). Returns per-turn rows
    ordered by turn_idx within each conversation, with ``conv_n_turns`` and
    ``doc_char_start`` (offset of the turn text inside the assembled
    "<role>: <text>\\n" conversation document). ``salt_threshold`` is
    retained for config/fingerprint compatibility; the sort-based shuffle
    needs no salting (see module docstring)."""
    del salt_threshold
    prepped = turns.map_batches(
        _prep_batch, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    local = prepped.sort(["conv_id", "turn_idx"]).materialize()
    bases = _collect_bases(local)
    return local.map_batches(
        _finalize_fn(bases), batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
