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
groupby. The whole thing is ONE shuffle execution: each group emits
window-local offsets plus tiny helper columns (salt, group char total,
group size); the materialized result is then scanned in-memory to find the
(few) multi-salt conversations, their global base offsets are stitched on
the driver, and a final vectorized patch pass fixes exactly those rows.
No full-input pre-scan ever runs."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

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

_HELPER_COLUMNS = ["salt", "group_total", "group_n"]


def _prep_batch(salt_threshold: int):
    def prep(t: pa.Table) -> pa.Table:
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

    return prep


def _assemble_group(t: pa.Table) -> pa.Table:
    """Sort one (conv_id, salt) group by turn_idx; emit window-LOCAL char
    offsets plus the helper columns the post-pass stitches from.
    Group-internal order is NOT guaranteed by Ray (SURVEY.md §7.4) — always
    sorts explicitly."""
    order = pc.sort_indices(t, sort_keys=[("turn_idx", "ascending")])
    t = t.take(order)
    contrib = t.column("contrib_len").to_numpy(zero_copy_only=False)
    role_len = pc.utf8_length(t["role"]).to_numpy(zero_copy_only=False)
    starts = np.concatenate(([0], np.cumsum(contrib[:-1]))) + role_len + 2
    n = t.num_rows
    t = t.append_column("conv_n_turns", pa.array(np.full(n, n, dtype=np.int32)))
    t = t.append_column("doc_char_start", pa.array(starts, pa.int64()))
    t = t.append_column("group_total", pa.array(np.full(n, int(contrib.sum())), pa.int64()))
    t = t.append_column("group_n", pa.array(np.full(n, n, dtype=np.int32)))
    return t.select(ASSEMBLED_COLUMNS[:-2] + ["salt", "conv_n_turns", "doc_char_start", "group_total", "group_n"])


_HEADER_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("salt", pa.int32()),
        ("group_total", pa.int64()),
        ("group_n", pa.int32()),
    ]
)


def _empty_headers() -> pa.Table:
    return _HEADER_SCHEMA.empty_table()


def _collect_bases(
    assembled_local: Dataset, salt_threshold: int
) -> dict[tuple[str, int], tuple[int, int]]:
    """{(conv_id, salt): (base_char_offset, conv_total_turns)} for multi-salt
    conversations. ONE scan over the pinned blocks emits a group header for
    every group that can belong to a skewed conversation: salt >= 1 (proof),
    or a FULL salt-0 window (group_n == salt_threshold — the salt-0 part of
    any dense multi-salt conversation). A salt-0 window that is partial yet
    still multi-salt (turn_idx gaps) is caught by a targeted second scan
    over just those conversations — the rare path; the common path is one
    pass (round-1 always ran two full scans)."""

    def candidate_headers(t: pa.Table) -> pa.Table:
        mask = pc.or_(
            pc.greater_equal(t["salt"], 1),
            pc.equal(t["group_n"], salt_threshold),
        )
        hit = t.filter(mask)
        if hit.num_rows == 0:
            return _empty_headers()
        return hit.group_by(
            ["conv_id", "salt", "group_total", "group_n"], use_threads=False
        ).aggregate([])

    rows = assembled_local.map_batches(
        candidate_headers, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).take_all()
    by_conv: dict[str, dict[int, tuple[int, int]]] = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], {})[r["salt"]] = (r["group_total"], r["group_n"])
    # keep only true multi-salt conversations (a lone full salt-0 window is
    # an ordinary conversation of exactly salt_threshold turns)
    by_conv = {c: g for c, g in by_conv.items() if any(s >= 1 for s in g)}
    if not by_conv:
        return {}

    # rare path: multi-salt conversations whose salt-0 header was partial
    # (turn_idx gaps) — fetch exactly those headers
    missing0 = sorted(c for c, g in by_conv.items() if 0 not in g)
    if missing0:
        def headers_of(t: pa.Table) -> pa.Table:
            hit = t.filter(pc.is_in(t["conv_id"], value_set=pa.array(missing0)))
            if hit.num_rows == 0:
                return _empty_headers()
            return hit.group_by(
                ["conv_id", "salt", "group_total", "group_n"], use_threads=False
            ).aggregate([])

        for r in assembled_local.map_batches(
            headers_of, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        ).take_all():
            by_conv.setdefault(r["conv_id"], {})[r["salt"]] = (
                r["group_total"], r["group_n"],
            )
    bases: dict[tuple[str, int], tuple[int, int]] = {}
    for conv_id, groups in by_conv.items():
        total_turns = sum(n for _, n in groups.values())
        acc = 0
        for salt in sorted(groups):
            bases[(conv_id, salt)] = (acc, total_turns)
            acc += groups[salt][0]
    return bases


def _patch_fn(bases: dict[tuple[str, int], tuple[int, int]]):
    big_convs = {c for c, _ in bases}

    def patch(t: pa.Table) -> pa.Table:
        if big_convs:
            mask = pc.is_in(t["conv_id"], value_set=pa.array(sorted(big_convs)))
            if pc.any(mask).as_py():
                conv_ids = t["conv_id"].to_pylist()
                salts = t["salt"].to_pylist()
                starts = t["doc_char_start"].to_numpy(zero_copy_only=False).copy()
                n_turns = t["conv_n_turns"].to_numpy(zero_copy_only=False).copy()
                m = mask.to_numpy(zero_copy_only=False)
                for i in np.flatnonzero(m):
                    base, total = bases[(conv_ids[i], salts[i])]
                    starts[i] += base
                    n_turns[i] = total
                t = t.set_column(
                    t.column_names.index("doc_char_start"),
                    "doc_char_start",
                    pa.array(starts, pa.int64()),
                )
                t = t.set_column(
                    t.column_names.index("conv_n_turns"),
                    "conv_n_turns",
                    pa.array(n_turns.astype(np.int32)),
                )
        return t.select(ASSEMBLED_COLUMNS)

    return patch


def assemble_dialogues(turns: Dataset, salt_threshold: int = 512) -> Dataset:
    """SHUFFLE #1 of the KG pipeline (SURVEY.md §3.4). Returns per-turn rows
    ordered by turn_idx within each (conv_id, salt) group, with
    ``conv_n_turns`` and ``doc_char_start`` (offset of the turn text inside
    the assembled "<role>: <text>\\n" conversation document)."""
    prepped = turns.map_batches(
        _prep_batch(salt_threshold), batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )
    local = prepped.groupby(["conv_id", "salt"]).map_groups(
        _assemble_group, batch_format="pyarrow"
    )
    # ONE execution materializes the shuffle; skew stitching reads only the
    # pinned blocks (cheap) and patches only the skewed conversations' rows
    local = local.materialize()
    bases = _collect_bases(local, salt_threshold)
    return local.map_batches(
        _patch_fn(bases), batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
