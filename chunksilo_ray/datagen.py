"""Deterministic synthetic transcript corpus generator (FIXTURES.md §1-2).

Emits the authoritative input schema from BASELINE.json input_hint:
``conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us]`` — rows SHUFFLED across the file so the pipeline's
groupby(conv_id)+sort(turn_idx) actually has to restore order — plus the small
``alias_index`` side table (alias, entity_id, entity_type).

Seeded (seed=42 convention, TESTDATA.md); no external data. Conversation
lengths follow a Zipf-ish distribution (most 4-20 turns, a long tail up to
~2000 turns at bench scale to exercise skew salting). Template sentences plant
known entity mentions / predicate cues so the oracle extractor's expected
triples are enumerable; alias variants of the same entity and unknown-surface
families exercise entity linking and canonicalization; ID-like mentions
("proj 1234" / "PROJ-1234") exercise the ID normalizer.
"""

from __future__ import annotations

import os
import pathlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import entities

EPOCH_US = np.datetime64("2025-01-01T00:00:00", "us").astype("int64")

# (template, slot kinds); slots are filled with random surface variants.
# Capitalized template words are covered by functions.textutils.STOPWORDS so
# they never read as mention candidates.
USER_TEMPLATES: list[tuple[str, tuple[str, ...]]] = [
    ("Can you check the {0} for {1}?", ("S", "A")),
    ("{0} reported that the {1} is failing with {2}.", ("P", "S", "U")),
    ("What does the {0} say about the {1}?", ("A", "S")),
    ("Please run {0} to inspect the {1}.", ("T", "S")),
    ('Did {0} update the "{1}" after ticket {2}?', ("P", "A", "K")),
    ("Is the {0} still talking to the {1}?", ("S", "S")),
]

ASSISTANT_TEMPLATES: list[tuple[str, tuple[str, ...]]] = [
    ("I configured the {0} with {1}.", ("S", "A")),
    ("The {0} now points to {1}.", ("S", "U")),
    ("Let me run {0} on {1}.", ("T", "A")),
    ("{0} should review the {1} for the {2}.", ("P", "A", "S")),
    ("I updated the {0} and deployed {1}.", ("S", "U")),
    ("Looking at the {0}, the {1} seems healthy.", ("A", "S")),
]

TOOL_TEMPLATES: list[tuple[str, tuple[str, ...]]] = [
    ("output: {0} contains {1}", ("A", "U")),
    ("error in the {0}: see ticket {1}", ("S", "K")),
    ("found 3 matches in {0} for the {1}", ("A", "S")),
    ("exit 0: {0} rebuilt, {1} notified", ("A", "S")),
]


def _surface_pools(rng: np.random.Generator):
    systems = [[k, *v] for k, v in entities.SYSTEMS.items()]
    artifacts = [[k, *v] for k, v in entities.ARTIFACTS.items()]
    tools = list(entities.TOOLS.keys())
    return {
        "P": [[p] for p in entities.PERSONS],
        "S": systems,
        "A": artifacts,
        "T": [[t] for t in tools],
        "U": entities.UNKNOWN_FAMILIES,
    }


def _ticket(rng: np.random.Generator) -> str:
    prefix = entities.TICKET_PREFIXES[rng.integers(len(entities.TICKET_PREFIXES))]
    num = int(rng.integers(1000, 99999))
    style = rng.integers(3)
    if style == 0:
        return f"{prefix} {num}"
    if style == 1:
        return f"{prefix}_{num}"
    return f"{prefix.upper()}-{num}"


def conversation_lengths(n_turns: int, rng: np.random.Generator) -> np.ndarray:
    """Zipf-ish lengths summing to ~n_turns; forces a couple of ~2000-turn
    conversations at bench scale so assembly salting is exercised."""
    cap = 2000 if n_turns >= 200_000 else max(8, min(400, n_turns // 4))
    lens: list[int] = []
    if n_turns >= 200_000:
        lens += [2000, 1800]
    total = sum(lens)
    # draw in chunks for speed
    while total < n_turns:
        draw = 4 + np.minimum((rng.pareto(1.3, 4096) * 4).astype(np.int64), cap - 4)
        for ln in draw:
            lens.append(int(ln))
            total += int(ln)
            if total >= n_turns:
                break
    return np.asarray(lens, dtype=np.int64)


def generate_transcripts(n_turns: int, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed)
    pools = _surface_pools(rng)
    lens = conversation_lengths(n_turns, rng)
    n_conv = len(lens)

    tmpl_by_role = {
        "user": USER_TEMPLATES,
        "assistant": ASSISTANT_TEMPLATES,
        "tool": TOOL_TEMPLATES,
    }
    tool_names = list(entities.TOOLS.keys())

    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools_col: list[str] = []
    ts_us: list[int] = []

    # pre-draw bulk randomness for speed
    for ci in range(n_conv):
        conv_id = f"conv-{ci:08d}"
        L = int(lens[ci])
        role_noise = rng.integers(0, 2, size=L)
        tmpl_pick = rng.integers(0, 1 << 30, size=L)
        for t in range(L):
            m = t % 3
            if m == 0:
                role = "user"
            elif m == 1:
                role = "assistant"
            else:
                role = "tool" if role_noise[t] else "assistant"
            templates = tmpl_by_role[role]
            tmpl, kinds = templates[tmpl_pick[t] % len(templates)]
            fills: list[str] = []
            for kind in kinds:
                if kind == "K":
                    fills.append(_ticket(rng))
                else:
                    fam = pools[kind]
                    variants = fam[rng.integers(len(fam))]
                    fills.append(variants[rng.integers(len(variants))])
            text = tmpl.format(*fills)
            tool = tool_names[int(tmpl_pick[t]) % len(tool_names)] if role == "tool" else ""
            conv_ids.append(conv_id)
            turn_idxs.append(t)
            roles.append(role)
            texts.append(text)
            tools_col.append(tool)
            ts_us.append(int(EPOCH_US + ci * 3_600_000_000 + t * 7_000_000))

    table = pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools_col, pa.string()),
            "ts": pa.array(ts_us, pa.timestamp("us")),
        }
    )
    # shuffle rows so the pipeline must actually sort within groups
    perm = rng.permutation(table.num_rows)
    return table.take(pa.array(perm))


def alias_table() -> pa.Table:
    rows = entities.build_alias_rows()
    return pa.table(
        {
            "alias": pa.array([r["alias"] for r in rows], pa.string()),
            "entity_id": pa.array([r["entity_id"] for r in rows], pa.string()),
            "entity_type": pa.array([r["entity_type"] for r in rows], pa.string()),
        }
    )


def n_turns_for_sf(sf: float) -> int:
    """FIXTURES.md scale tiers: sf0.001 ~5k turns, sf0.01 ~50k, sf0.1 ~500k."""
    return max(1000, int(round(5_000_000 * sf)))


def sf_from_dir(sf_dir: str) -> float:
    """Parse '…/sf0.01' → 0.01; default 0.001 when unparseable."""
    name = pathlib.Path(sf_dir).name
    if name.startswith("sf"):
        try:
            return float(name[2:])
        except ValueError:
            pass
    return 0.001


def corpus_dir(
    sf: float, seed: int = 42, cache_root: str = "/tmp/chunksilo_ray_testdata"
) -> str:
    """Generate (once, cached) the transcript corpus for a scale factor.
    Returns a directory containing transcripts.parquet + alias_index.parquet."""
    n_turns = n_turns_for_sf(sf)
    out = pathlib.Path(cache_root) / f"sf{sf:g}-seed{seed}"
    marker = out / "_SUCCESS"
    if marker.exists():
        return str(out)
    tmp = pathlib.Path(str(out) + ".tmp")
    if tmp.exists():
        import shutil

        shutil.rmtree(tmp)
    tmp.mkdir(parents=True, exist_ok=True)
    table = generate_transcripts(n_turns, seed=seed)
    # modest row groups so Ray's parquet read parallelizes across tasks
    pq.write_table(table, tmp / "transcripts.parquet", row_group_size=16384)
    pq.write_table(alias_table(), tmp / "alias_index.parquet")
    os.replace(tmp, out)
    (out / "_SUCCESS").touch()
    return str(out)
