"""Mention detection + entity linking + triple extraction (one actor stage).

The KG analog of the reference's scoring stages: alias matching plays the
role of BM25 filename match (reference src/chunksilo/index.py:1218-1265) and
rerank scoring (search.py:1184-1248); the alias table is the broadcast
small-side (``ray.put`` once on the driver, ``ray.get`` once per actor in
``__init__`` — never re-shipped per batch).

One stage computes BOTH nested outputs per turn —

    mentions: list<struct<entity_id, surface, norm, entity_type, known>>
    triples:  list<struct<subj, pred, obj>>

— so the two downstream branches (nodes <- mentions, edges <- triples) can
explode from one checkpointed dataset instead of re-running the scan. Turn
atomicity is trivially preserved: a turn's mentions/triples live in its own
row, so batch boundaries can never split a turn.
"""

from __future__ import annotations

import pyarrow as pa
import ray

from ray.data import Dataset

from ..extraction_core import AliasIndex, scan_mentions, triples_for_turn

MENTION_STRUCT = pa.struct(
    [
        ("entity_id", pa.string()),
        ("surface", pa.string()),
        ("norm", pa.string()),
        ("entity_type", pa.string()),
        ("known", pa.bool_()),
    ]
)
TRIPLE_STRUCT = pa.struct([("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string())])


def extract_batch(
    t: pa.Table,
    alias: AliasIndex,
    token_cache: dict[str, tuple[str, ...]],
    per_row_seconds: float,
) -> pa.Table:
    """The per-batch extraction kernel, shared verbatim by the actor-pool and
    stateless-task stage variants (so the two modes are output-identical by
    construction — parity-tested in tests/test_round2.py)."""
    import time

    roles = t.column("role").to_pylist()
    tools = t.column("tool").to_pylist()
    texts = t.column("text").to_pylist()

    mentions_col: list[list[dict]] = []
    triples_col: list[list[dict]] = []
    errors_col: list[str | None] = []
    for r in range(t.num_rows):
        # explicit skipped-row policy (SURVEY.md §4): a pathological row
        # never kills the batch and never disappears silently — it emits
        # empty mentions/triples plus an ``error`` marker the pipeline
        # counts and surfaces in the stage manifest (the reference logs
        # and returns [] per failed file, index.py:1355-1360; here the
        # dead letter is a first-class column).
        try:
            row_t0 = time.monotonic()
            ms = scan_mentions(texts[r], alias, token_cache)
            ts3 = triples_for_turn(roles[r], tools[r], texts[r], ms, alias)
            elapsed = time.monotonic() - row_t0
            if elapsed > per_row_seconds:
                # wall-clock budget guard (reference per_file_seconds,
                # cfgload.py:74-80): an adversarial row that grinds the
                # extractor is dead-lettered — its outputs are DROPPED so
                # a rerun with a fixed budget is deterministic, the batch
                # survives, and the row is counted in the stage manifest.
                ms, ts3 = [], []
                errors_col.append(
                    f"TimeBudgetExceeded: row took {elapsed:.1f}s "
                    f"(> {per_row_seconds:.1f}s)"
                )
            else:
                errors_col.append(None)
        except Exception as exc:  # noqa: BLE001 - dead-letter boundary
            ms, ts3 = [], []
            errors_col.append(f"{type(exc).__name__}: {exc}"[:200])
        mentions_col.append(
            [
                {
                    "entity_id": m.entity_id,
                    "surface": m.surface,
                    "norm": m.norm,
                    "entity_type": m.entity_type,
                    "known": m.known,
                }
                for m in ms
            ]
        )
        triples_col.append([{"subj": s, "pred": p, "obj": o} for s, p, o in ts3])

    keep = [c for c in ("conv_id", "turn_idx", "role", "tool", "ts") if c in t.column_names]
    out = t.select(keep)
    out = out.append_column("mentions", pa.array(mentions_col, pa.list_(MENTION_STRUCT)))
    out = out.append_column("triples", pa.array(triples_col, pa.list_(TRIPLE_STRUCT)))
    out = out.append_column("error", pa.array(errors_col, pa.string()))
    return out


class LinkExtractActor:
    """Actor-pool stage: per-turn mention scan + rule-based triple extraction.

    ``alias_ref`` is an ``ray.ObjectRef`` to the alias Arrow table (broadcast
    once); the token-tuple lookup dict is built once per actor.
    """

    def __init__(self, alias_ref, max_ngram: int = 3, per_row_seconds: float = 5.0):
        alias_table = ray.get(alias_ref)
        self.alias = AliasIndex.from_arrow(alias_table, max_ngram=max_ngram)
        self.token_cache: dict[str, tuple[str, ...]] = {}  # actor-lifetime memo
        self.per_row_seconds = per_row_seconds

    def __call__(self, t: pa.Table) -> pa.Table:
        return extract_batch(t, self.alias, self.token_cache, self.per_row_seconds)


# worker-global state for the stateless-task stage variant: the alias index is
# built ONCE per worker process (keyed by broadcast ref + build params) and the
# token-tuple memo lives for the worker's lifetime — the task twin of doing the
# work in an actor's __init__, minus the actor-process startup (tasks reuse
# warm workers; a fresh actor pool pays a process spawn + import per actor on
# every pipeline run — measured 1-2 s per stage in BASELINE.md's traces)
_WORKER_ALIAS: dict[tuple[str, int], AliasIndex] = {}
_WORKER_TOKENS: dict[str, tuple[str, ...]] = {}


def _worker_alias_index(alias_ref, max_ngram: int) -> AliasIndex:
    key = (alias_ref.hex(), max_ngram)
    idx = _WORKER_ALIAS.get(key)
    if idx is None:
        if len(_WORKER_ALIAS) > 4:
            _WORKER_ALIAS.clear()
        from ..util import cached_get

        idx = AliasIndex.from_arrow(cached_get(alias_ref), max_ngram=max_ngram)
        _WORKER_ALIAS[key] = idx
    return idx


def link_extract(
    turns: Dataset,
    alias_ref,
    max_ngram: int = 3,
    batch_size: int = 2048,
    concurrency: int | tuple[int, int] = 4,
    num_cpus: float = 1,
    per_row_seconds: float = 5.0,
    mode: str = "auto",
) -> Dataset:
    """Stage modes (identical output, same kernel):

    - ``tasks`` (the ``auto`` choice): stateless map tasks + worker-global
      alias-index memo. The alias index is cheap to build (small broadcast
      table), so paying it once per warm worker beats paying an actor-process
      spawn per pool slot per run — and the stage instantly scales to every
      free CPU instead of a fixed pool, which matters when it overlaps the
      chunk/embed branch under backpressure.
    - ``actors``: the classic actor pool — the right shape when per-worker
      state is genuinely expensive (e.g. a real ONNX model in the linked
      scorer); kept as the opt-in for such backends.
    """
    if mode == "auto":
        mode = "tasks"
    if mode == "tasks":
        def _task(t: pa.Table) -> pa.Table:
            alias = _worker_alias_index(alias_ref, max_ngram)
            return extract_batch(t, alias, _WORKER_TOKENS, per_row_seconds)

        return turns.map_batches(
            _task,
            batch_format="pyarrow",
            batch_size=batch_size,
            zero_copy_batch=True,
        )
    # cluster-sized autoscaling pool: an int cap becomes (max//2, max) bounded
    # by available CPUs — never reserves every CPU (deadlock on small
    # sessions), never idles the cluster waiting on the autoscaler ramp.
    # concurrency=0 (config default) means "size purely from the cluster".
    if isinstance(concurrency, int):
        from ..util import pool_bounds

        concurrency = pool_bounds(concurrency if concurrency > 0 else None, num_cpus)
    return turns.map_batches(
        LinkExtractActor,
        fn_constructor_kwargs={
            "alias_ref": alias_ref,
            "max_ngram": max_ngram,
            "per_row_seconds": per_row_seconds,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
        zero_copy_batch=True,
    )


def explode_triples(extracted: Dataset) -> Dataset:
    """Flatten the nested triples column -> one row per (subj, pred, obj)
    occurrence, keyed by (conv_id, turn_idx). Vectorized with Arrow list
    flatten (no Python row loop)."""

    def fn(t: pa.Table) -> pa.Table:
        lst = t.column("triples")
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        flat = lst.flatten()
        # parent index per flattened element
        import numpy as np

        lengths = lst.value_lengths().to_numpy(zero_copy_only=False).astype("int64")
        parents = np.repeat(np.arange(len(lengths)), lengths)
        idx = pa.array(parents)
        return pa.table(
            {
                "conv_id": t.column("conv_id").take(idx),
                "turn_idx": t.column("turn_idx").take(idx),
                "subj": flat.field("subj"),
                "pred": flat.field("pred"),
                "obj": flat.field("obj"),
            }
        )

    return extracted.map_batches(fn, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def explode_mentions(extracted: Dataset) -> Dataset:
    """Flatten the nested mentions column -> one row per mention occurrence."""

    def fn(t: pa.Table) -> pa.Table:
        lst = t.column("mentions")
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        flat = lst.flatten()
        import numpy as np

        lengths = lst.value_lengths().to_numpy(zero_copy_only=False).astype("int64")
        parents = np.repeat(np.arange(len(lengths)), lengths)
        idx = pa.array(parents)
        return pa.table(
            {
                "conv_id": t.column("conv_id").take(idx),
                "turn_idx": t.column("turn_idx").take(idx),
                "entity_id": flat.field("entity_id"),
                "surface": flat.field("surface"),
                "norm": flat.field("norm"),
                "entity_type": flat.field("entity_type"),
                "known": flat.field("known"),
            }
        )

    return extracted.map_batches(fn, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
