"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init(...)`` BEFORE importing this module; nothing here
(or in chunksilo_ray) calls ray.init()/ray.shutdown().

- ``entry()``: flagship KG-construction pipeline on a deterministic synthetic
  transcript corpus at smoke scale (FIXTURES.md §1 schema — the BASELINE.json
  input_hint table), returning the edges Dataset.
- ``queries()``: one callable per implemented operator/pipeline from
  SURVEY.md §2 + the training-data ops (dedup / similarity / text analysis /
  multimodal plumbing). Callables take sf_dir (driver testdata tables).
  Bodies live in chunksilo_ray/queries.py (this file is a pure registry
  delegator).
- ``oracle_sql()``: matching DuckDB SQL for the SQL-expressible subset
  (column names match exactly; float aggregates ROUND()ed identically on
  both sides), from chunksilo_ray/oracles.py. Only the genuinely-approximate
  ops (IVF probe search, HLL) and the composite search pipeline are
  rows-only; KG outputs are value-oracled from their written checkpoints
  (docs_dir_scan pattern).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline at smoke scale; driver checks rows>=0 + stable schema."""
    from chunksilo_ray import datagen
    from chunksilo_ray.pipelines.kg import build_kg

    corpus = datagen.corpus_dir(0.001)
    res = build_kg(
        f"{corpus}/transcripts.parquet",
        f"{corpus}/alias_index.parquet",
        "/tmp/chunksilo_ray_kg_out/sf0.001",
        with_chunks=True,
    )
    return res["edges"]


def queries() -> dict[str, Callable[[str], Any]]:
    from chunksilo_ray.queries import queries as _impl

    return _impl()


def oracle_sql() -> dict[str, str]:
    from chunksilo_ray.oracles import oracle_sql as _impl

    return _impl()
