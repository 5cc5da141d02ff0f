"""Dialogue-assembly invariants (north rule: per-turn text equality under
stable turn ordering) + salted-skew offset stitching."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from chunksilo_ray import datagen
from chunksilo_ray.stages.assemble import assemble_dialogues

pytestmark = pytest.mark.usefixtures("ray_session")


def _reference_offsets(rows):
    """Single-process recomputation of doc_char_start for verification."""
    rows = sorted(rows, key=lambda r: r["turn_idx"])
    out = {}
    acc = 0
    for r in rows:
        out[r["turn_idx"]] = acc + len(r["role"]) + 2
        acc += len(r["role"]) + 2 + len(r["text"]) + 1
    return out


def test_per_turn_text_equality_and_order():
    src = datagen.generate_transcripts(3000, seed=42)
    ds = rd.from_arrow(src)
    out = assemble_dialogues(ds, salt_threshold=512).take_all()

    # per-turn text byte-equality vs the input column
    expected = {
        (c, i): t
        for c, i, t in zip(
            src.column("conv_id").to_pylist(),
            src.column("turn_idx").to_pylist(),
            src.column("text").to_pylist(),
        )
    }
    assert len(out) == src.num_rows
    for r in out:
        assert r["text"] == expected[(r["conv_id"], r["turn_idx"])]

    # offsets match a single-process reassembly for a few conversations
    by_conv: dict[str, list] = {}
    for r in out:
        by_conv.setdefault(r["conv_id"], []).append(r)
    for conv_id in list(by_conv)[:10]:
        rows = by_conv[conv_id]
        ref = _reference_offsets(rows)
        for r in rows:
            assert r["doc_char_start"] == ref[r["turn_idx"]]
        assert all(r["conv_n_turns"] == len(rows) for r in rows)


def test_salting_stitches_giant_conversation():
    # one conversation far above the salt threshold, shuffled input
    n = 1500
    rng = np.random.default_rng(7)
    perm = rng.permutation(n)
    t = pa.table(
        {
            "conv_id": pa.array(["conv-big"] * n),
            "turn_idx": pa.array(perm.astype("int32")),
            "role": pa.array(["user" if i % 2 == 0 else "assistant" for i in perm]),
            "text": pa.array([f"turn text number {i}" for i in perm]),
            "tool": pa.array([""] * n),
            "ts": pa.array(np.arange(n)[perm], pa.timestamp("us")),
        }
    )
    # broadcast_limit=0 forces the sort fallback — the giant-conversation
    # range-partitioning property belongs to that path
    out = assemble_dialogues(rd.from_arrow(t), salt_threshold=128, broadcast_limit=0).take_all()
    assert len(out) == n
    assert all(r["conv_n_turns"] == n for r in out)
    ref = _reference_offsets(
        [{"turn_idx": i, "role": "user" if i % 2 == 0 else "assistant",
          "text": f"turn text number {i}"} for i in range(n)]
    )
    for r in out:
        assert r["doc_char_start"] == ref[r["turn_idx"]], r["turn_idx"]


def test_broadcast_and_sort_paths_are_value_identical():
    """The lengths-broadcast path (default) and the full-sort fallback must
    produce identical (conv_id, turn_idx) -> (text, conv_n_turns,
    doc_char_start) mappings on a shuffled multi-conversation corpus."""
    src = datagen.generate_transcripts(2000, seed=9)
    ds = rd.from_arrow(src)

    def keyed(rows):
        return {
            (r["conv_id"], r["turn_idx"]): (r["text"], r["conv_n_turns"], r["doc_char_start"])
            for r in rows
        }

    broadcast = keyed(assemble_dialogues(ds).take_all())
    fallback = keyed(assemble_dialogues(ds, broadcast_limit=0).take_all())
    assert broadcast == fallback


def test_sparse_turn_idx_offsets():
    """Sparse, gappy turn_idx values: assembly must compute exact per-turn
    char offsets and conv_n_turns from turn_idx ordering, not from index
    contiguity. Runs the default (broadcast) path; block-boundary coverage
    for the sort fallback lives in test_fragment_stitching_under_tiny_blocks."""
    idxs = [0, 3, 7, 200, 201, 450]
    t = pa.table(
        {
            "conv_id": pa.array(["conv-sparse"] * len(idxs)),
            "turn_idx": pa.array(idxs, pa.int32()),
            "role": pa.array(["user"] * len(idxs)),
            "text": pa.array([f"sparse turn {i}" for i in idxs]),
            "tool": pa.array([""] * len(idxs)),
            "ts": pa.array(list(range(len(idxs))), pa.timestamp("us")),
        }
    )
    out = assemble_dialogues(rd.from_arrow(t)).take_all()
    assert len(out) == len(idxs)
    assert all(r["conv_n_turns"] == len(idxs) for r in out)
    ref = _reference_offsets(
        [{"turn_idx": i, "role": "user", "text": f"sparse turn {i}"} for i in idxs]
    )
    for r in out:
        assert r["doc_char_start"] == ref[r["turn_idx"]], r["turn_idx"]


def test_fragment_stitching_under_tiny_blocks():
    """Force MANY block-boundary fragments (tiny target block size + random
    conversation lengths): every turn's doc_char_start and conv_n_turns must
    equal the single-process reference, for every conversation — the
    stitch path, not the common path, does the work here."""
    rng = np.random.default_rng(7)
    rows = []
    for c in range(40):
        n = int(rng.integers(1, 120))
        for i in rng.permutation(n):  # shuffled input order
            rows.append(
                {
                    "conv_id": f"conv-{c:04d}",
                    "turn_idx": int(i),
                    "role": ["user", "assistant", "tool"][int(i) % 3],
                    "text": "x" * int(rng.integers(1, 80)),
                    "tool": "",
                    "ts": None,
                }
            )
    t = pa.Table.from_pylist(rows)

    ctx = rd.DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 8 * 1024  # ~tens of rows per block
    try:
        # sort-path coverage: stitching only exists on the fallback
        out = assemble_dialogues(rd.from_arrow(t), broadcast_limit=0).take_all()
    finally:
        ctx.target_max_block_size = old

    by_conv: dict[str, list] = {}
    for r in out:
        by_conv.setdefault(r["conv_id"], []).append(r)
    assert len(out) == len(rows)
    for conv_id, conv_rows in by_conv.items():
        ref = _reference_offsets(conv_rows)
        n = len(conv_rows)
        for r in conv_rows:
            assert r["conv_n_turns"] == n, (conv_id, r["turn_idx"])
            assert r["doc_char_start"] == ref[r["turn_idx"]], (conv_id, r["turn_idx"])


def test_broadcast_attach_boundary_keys():
    """Compound-key attach edge cases: conv ids that are prefixes of each
    other and turn_idx values up to int32 max must resolve exactly (the
    key packs conv code << 32 | turn — the full int32 range must survive)."""
    big = 2**31 - 1
    rows = []
    for conv in ["c", "c1", "c11"]:
        for turn in [0, 1, big - 1, big]:
            rows.append((conv, turn, "user", f"t-{conv}-{turn}"))
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows]),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows]),
            "text": pa.array([r[3] for r in rows]),
            "tool": pa.array([""] * len(rows)),
            "ts": pa.array([0] * len(rows), pa.int64()),
        }
    )
    ds = rd.from_arrow(t)
    out = assemble_dialogues(ds).take_all()          # broadcast path
    ref = assemble_dialogues(ds, broadcast_limit=0).take_all()  # sort path
    key = lambda r: (r["conv_id"], r["turn_idx"])  # noqa: E731
    a = {key(r): (r["doc_char_start"], r["conv_n_turns"]) for r in out}
    b = {key(r): (r["doc_char_start"], r["conv_n_turns"]) for r in ref}
    assert a == b and len(a) == len(rows)
    # per-conv offsets agree with the single-process reference
    for conv in ["c", "c1", "c11"]:
        sub = [r for r in rows if r[0] == conv]
        exp = _reference_offsets(
            [{"turn_idx": r[1], "role": r[2], "text": r[3]} for r in sub]
        )
        for r in out:
            if r["conv_id"] == conv:
                assert r["doc_char_start"] == exp[r["turn_idx"]]
