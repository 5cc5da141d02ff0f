"""Generator determinism + schema contract (FIXTURES.md §1-2)."""

import pyarrow as pa

from chunksilo_ray import datagen


def test_schema_matches_input_hint():
    t = datagen.generate_transcripts(1000, seed=42)
    assert t.schema.field("conv_id").type == pa.string()
    assert t.schema.field("turn_idx").type == pa.int32()
    assert t.schema.field("role").type == pa.string()
    assert t.schema.field("text").type == pa.string()
    assert t.schema.field("tool").type == pa.string()
    assert t.schema.field("ts").type == pa.timestamp("us")


def test_deterministic():
    a = datagen.generate_transcripts(2000, seed=42)
    b = datagen.generate_transcripts(2000, seed=42)
    assert a.equals(b)


def test_rows_are_shuffled_but_complete():
    t = datagen.generate_transcripts(2000, seed=42)
    tis = t.column("turn_idx").to_pylist()
    cids = t.column("conv_id").to_pylist()
    # shuffled: not globally sorted by (conv, turn)
    assert sorted(zip(cids, tis)) != list(zip(cids, tis))
    # complete: every conversation has a dense 0..n-1 turn_idx range
    per_conv: dict[str, list[int]] = {}
    for c, i in zip(cids, tis):
        per_conv.setdefault(c, []).append(i)
    for c, idxs in per_conv.items():
        assert sorted(idxs) == list(range(len(idxs)))


def test_tool_column_contract():
    t = datagen.generate_transcripts(2000, seed=42)
    for role, tool in zip(t.column("role").to_pylist(), t.column("tool").to_pylist()):
        if role == "tool":
            assert tool != ""
        else:
            assert tool == ""


def test_ts_monotone_within_conversation():
    t = datagen.generate_transcripts(2000, seed=42)
    rows = sorted(
        zip(t.column("conv_id").to_pylist(), t.column("turn_idx").to_pylist(),
            t.column("ts").to_pylist())
    )
    for (c1, i1, ts1), (c2, i2, ts2) in zip(rows, rows[1:]):
        if c1 == c2:
            assert ts2 > ts1


def test_alias_table_covers_known_entities():
    at = datagen.alias_table()
    ids = set(at.column("entity_id").to_pylist())
    assert "system:database" in ids
    assert "tool:bash" in ids
    assert "person:alice" in ids
    assert "artifact:config-yaml" in ids
