"""Dialogue assembly: groupby(conv_id) + sort(turn_idx) reassembly.

The Ray-Data analog of the reference's heading-aware document splitting
(reference src/chunksilo/docx_utils.py:118-285: group body under ordered
headings -> per-section documents): group turns per conversation, restore
turn order, and compute each turn's character offset inside the assembled
conversation document ("<role>: <text>\n" per turn).

Per the north rule, the per-turn ``text`` column passes through BYTE-EQUAL —
assembly adds ordering/offset columns, it never rewrites text.

Skew handling (north rule: "salted repartitioning"): the shuffle key is
always ``(conv_id, salt)`` with ``salt = turn_idx // salt_threshold``; for
ordinary conversations salt == 0 and this degenerates to a plain conv_id
groupby. Giant conversations split into bounded sub-groups, and their global
char offsets / turn counts are stitched with a driver-collected base-offset
map that only contains the (few) multi-salt conversations — never one row
per conversation, so the driver side stays O(#giant convs) at any scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count, Sum

# assembled-turn output schema (per-turn rows, conversation-ordered within
# each (conv_id, salt) group)
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


def _prep_batch(salt_threshold: int):
    def fn(t: pa.Table) -> pa.Table:
        salt = pc.cast(
            pc.floor(pc.divide(pc.cast(t["turn_idx"], pa.float64()), salt_threshold)),
            pa.int32(),
        )
        # per-turn contribution to the assembled doc: len(role) + ": " + len(text) + "\n"
        contrib = pc.add(
            pc.add(pc.utf8_length(t["role"]), pc.utf8_length(t["text"])),
            pa.scalar(3, pa.int32()),
        )
        t = t.append_column("salt", salt)
        return t.append_column("contrib_len", pc.cast(contrib, pa.int64()))

    return fn


def _find_big_convs(prepped: Dataset, salt_threshold: int) -> set[str]:
    """Conversations that cross the salt threshold identify themselves: they
    are exactly the ones owning rows with salt >= 1. A vectorized filter +
    per-batch unique leaves only O(#skew conversations x their overflow
    rows), so no full-cardinality groupby ever runs."""

    def salted_convs(t: pa.Table) -> pa.Table:
        hit = t.filter(pc.greater_equal(t["salt"], 1))
        return pa.table({"conv_id": pc.unique(hit["conv_id"])})

    rows = prepped.map_batches(
        salted_convs, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    return {r["conv_id"] for r in rows}


def _collect_bases_for(
    prepped: Dataset, big_conv_ids: set[str]
) -> dict[tuple[str, int], tuple[int, int]]:
    """{(conv_id, salt): (base_char_offset, conv_total_turns)} for the (few)
    skew-salted conversations only — the totals aggregate runs on a filtered
    stream, never over the whole input."""
    if not big_conv_ids:
        return {}

    def keep(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t["conv_id"], value_set=pa.array(sorted(big_conv_ids)))
        return t.filter(mask)

    totals = (
        prepped.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["conv_id", "salt"])
        .aggregate(Sum("contrib_len", alias_name="salt_total"), Count(alias_name="n_turns"))
    )
    rows = totals.take_all()
    by_conv: dict[str, list] = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r)
    bases: dict[tuple[str, int], tuple[int, int]] = {}
    for conv_id, grp in by_conv.items():
        grp.sort(key=lambda r: r["salt"])
        total_turns = sum(r["n_turns"] for r in grp)
        acc = 0
        for r in grp:
            bases[(conv_id, r["salt"])] = (acc, total_turns)
            acc += r["salt_total"]
    return bases


def _assemble_group_fn(bases: dict[tuple[str, int], tuple[int, int]]):
    """map_groups fn factory: sort one (conv_id, salt) group by turn_idx and
    compute global char offsets. Group-internal order is NOT guaranteed by
    Ray (SURVEY.md §7.4) — always sorts explicitly. ``bases`` is tiny (only
    skew-salted conversations), so closure capture is cheap."""

    def assemble_group(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("turn_idx", "ascending")])
        t = t.take(order)
        conv_id = t.column("conv_id")[0].as_py()
        salt = t.column("salt")[0].as_py()
        base, total_turns = bases.get((conv_id, salt), (0, t.num_rows))
        contrib = t.column("contrib_len").to_numpy(zero_copy_only=False)
        role_len = pc.utf8_length(t["role"]).to_numpy(zero_copy_only=False)
        starts = base + np.concatenate(([0], np.cumsum(contrib[:-1]))) + role_len + 2
        t = t.append_column(
            "conv_n_turns", pa.array(np.full(t.num_rows, total_turns, dtype=np.int32))
        )
        t = t.append_column("doc_char_start", pa.array(starts, pa.int64()))
        return t.select(ASSEMBLED_COLUMNS)

    return assemble_group


def assemble_dialogues(turns: Dataset, salt_threshold: int = 512) -> Dataset:
    """SHUFFLE #1 of the KG pipeline (SURVEY.md §3.4). Returns per-turn rows
    ordered by turn_idx within each (conv_id, salt) group, with
    ``conv_n_turns`` and ``doc_char_start`` (offset of the turn text inside
    the assembled "<role>: <text>\\n" conversation document)."""
    prepped = turns.map_batches(
        _prep_batch(salt_threshold), batch_format="pyarrow", zero_copy_batch=True
    )
    big = _find_big_convs(prepped, salt_threshold)
    bases = _collect_bases_for(prepped, big)
    return prepped.groupby(["conv_id", "salt"]).map_groups(
        _assemble_group_fn(bases), batch_format="pyarrow"
    )
