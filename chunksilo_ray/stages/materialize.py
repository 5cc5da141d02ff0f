"""Graph materialize: dedupe/weight triples and mentions into Parquet-ready
node / edge tables (SHUFFLE #3 of the pipeline, SURVEY.md §3.4).

Output schemas (SURVEY.md §1 "Graft output tables"):

    edges(subj, pred, obj, conv_id, turn_idx, weight:int64)
        weight = occurrences of the triple within the turn
    nodes(entity_id, surface, canonical, type, freq:int64)
        one row per (entity_id, surface); freq = mention count of that
        surface; canonical = the entity id's canonical surface form

Ray Data's hash aggregation combines partial counts per block before the
exchange, so the all-to-all moves one row per distinct key per block — not
one row per occurrence.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count


def materialize_edges(triples: Dataset) -> Dataset:
    """triple occurrence rows -> weighted edge rows."""
    agg = triples.groupby(["subj", "pred", "obj", "conv_id", "turn_idx"]).aggregate(
        Count(alias_name="weight")
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.set_column(
            t.column_names.index("weight"), "weight", pc.cast(t.column("weight"), pa.int64())
        )
        return t.select(["subj", "pred", "obj", "conv_id", "turn_idx", "weight"])

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def materialize_nodes(mentions: Dataset) -> Dataset:
    """canonicalized mention rows -> node rows with per-surface frequencies."""
    agg = mentions.groupby(["entity_id", "surface", "entity_type"]).aggregate(
        Count(alias_name="freq")
    )

    def finish(t: pa.Table) -> pa.Table:
        # canonical surface = entity id past the "<kind>:" prefix
        canonical = pc.replace_substring_regex(
            t.column("entity_id"), pattern=r"^[a-z]+:", replacement=""
        )
        out = pa.table(
            {
                "entity_id": t.column("entity_id"),
                "surface": t.column("surface"),
                "canonical": canonical,
                "type": t.column("entity_type"),
                "freq": pc.cast(t.column("freq"), pa.int64()),
            }
        )
        return out

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
