"""JSONL / CSV interchange: Ray Data sinks + sources beyond Parquet.

The reference loads line- and record-oriented files from disk
(reference src/chunksilo/index.py:493-760 format dispatch); at pipeline
scale the same need appears as JSONL/CSV interchange with external
systems (label vendors, API dumps, legacy exports). These operators
demonstrate BOTH directions through Ray Data's native sinks/sources —
``Dataset.write_json`` / ``ray.data.read_json`` and ``write_csv`` /
``read_csv`` — and their correctness contract is ROUNDTRIP LOSSLESSNESS:
each query answers from the roundtripped files while its DuckDB oracle
answers from the ORIGINAL parquet, so a value match proves nothing was
lost or mangled in flight.

Scale shape: the export is a streaming distributed write (one file per
block, resumable layout), the re-read is a streaming distributed read,
and the verification aggregate collapses per-batch to bounded partials.
Column choice is deliberate: string/int columns only — pandas' JSON
writer truncates doubles (to_json double_precision default), so float
columns must go through Parquet, not JSONL; that constraint is the
documented contract of this interchange path."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Max, Min, Sum

_EXPORT_ROOT = "/tmp/chunksilo_ray_interchange"


def _export_once(src: Dataset, out_dir: str, fmt: str) -> str:
    """Write ``src`` once per (path, format); a _SUCCESS marker written
    AFTER the sink finishes makes the cached export crash-safe (the
    manifest-protocol shape: a partial dir without the marker is rewritten)."""
    marker = os.path.join(out_dir, "_SUCCESS")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(out_dir, ignore_errors=True)
        if fmt == "json":
            src.write_json(out_dir)
        else:
            src.write_csv(out_dir)
        with open(marker, "w") as f:
            f.write("ok")
    return out_dir


def jsonl_roundtrip_transcripts(transcripts_path: str) -> Dataset:
    """Transcripts → JSONL (``write_json``: one ``.json`` lines-file per
    block) → ``read_json`` → per-role profile (role, n_turns, total_chars,
    max_turn_idx). The oracle computes the same profile from the original
    parquet: a match proves the JSONL roundtrip preserved every row, every
    string byte (JSON escaping included — ticket ids, quotes) and every
    int."""
    src = rd.read_parquet(
        transcripts_path, columns=["conv_id", "turn_idx", "role", "text"]
    )
    key = os.path.basename(os.path.dirname(transcripts_path)) or "t"
    out = _export_once(src, f"{_EXPORT_ROOT}/jsonl_{key}", "json")
    ds = rd.read_json(out, file_extensions=["json"])

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "role": t["role"],
                    "total_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
                    "max_turn_idx": pc.cast(t["turn_idx"], pa.int64()),
                }
            )
            .group_by("role", use_threads=False)
            .aggregate([("total_chars", "sum"), ("max_turn_idx", "max"), ([], "count_all")])
        )
        return g.rename_columns(["role", "total_chars", "max_turn_idx", "n_turns"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("role")
        .aggregate(
            Sum("n_turns", alias_name="n_turns"),
            Sum("total_chars", alias_name="total_chars"),
            Max("max_turn_idx", alias_name="max_turn_idx"),
        )
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "role": t["role"],
                "n_turns": pc.cast(t["n_turns"], pa.int64()),
                "total_chars": pc.cast(t["total_chars"], pa.int64()),
                "max_turn_idx": pc.cast(t["max_turn_idx"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )


def csv_roundtrip_events(sf_dir: str) -> Dataset:
    """Events (int/string columns) → CSV (``write_csv``) → ``read_csv`` →
    per-type profile (event_type, n_events, min_event_id, max_event_id,
    sum_user_id). Oracle reads the original parquet — a match proves CSV
    quoting/typing roundtripped cleanly. Float columns are excluded by
    contract (text float formatting is not bit-stable; floats belong in
    Parquet)."""
    src = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "event_type"]
    )
    key = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = _export_once(src, f"{_EXPORT_ROOT}/csv_events_{key}", "csv")
    ds = rd.read_csv(out, file_extensions=["csv"])

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "event_type": t["event_type"],
                    "event_id": pc.cast(t["event_id"], pa.int64()),
                    "mx": pc.cast(t["event_id"], pa.int64()),
                    "sum_user_id": pc.cast(t["user_id"], pa.int64()),
                }
            )
            .group_by("event_type", use_threads=False)
            .aggregate(
                [("event_id", "min"), ("mx", "max"), ("sum_user_id", "sum"), ([], "count_all")]
            )
        )
        return g.rename_columns(
            ["event_type", "min_event_id", "max_event_id", "sum_user_id", "n_events"]
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("event_type")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Min("min_event_id", alias_name="min_event_id"),
            Max("max_event_id", alias_name="max_event_id"),
            Sum("sum_user_id", alias_name="sum_user_id"),
        )
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "event_type": t["event_type"],
                "n_events": pc.cast(t["n_events"], pa.int64()),
                "min_event_id": pc.cast(t["min_event_id"], pa.int64()),
                "max_event_id": pc.cast(t["max_event_id"], pa.int64()),
                "sum_user_id": pc.cast(t["sum_user_id"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )


def partitioned_parquet_roundtrip(edges_agg: Dataset, cache_key: str) -> Dataset:
    """Hive-partitioned Parquet sink + source: the aggregated KG triple
    table exported with ``write_parquet(partition_cols=["pred"])`` — one
    directory per predicate, the RESUMABLE layout (a failed export rerun
    skips or rewrites whole partitions, never splices files) and the
    pruning layout (a predicate-filtered reader opens one directory) —
    then re-read with partition-column recovery and collapsed to the
    per-predicate profile (pred, n_triples, total_weight, n_subjects).
    The oracle computes the same profile from the ORIGINAL checkpoint, so
    a value match proves the partitioned roundtrip preserved every row,
    the partition key included."""
    out = f"{_EXPORT_ROOT}/part_edges_{cache_key}"
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        edges_agg.write_parquet(out, partition_cols=["pred"])
        with open(marker, "w") as f:
            f.write("ok")
    ds = rd.read_parquet(out)

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "pred": t["pred"],
                    "subj": t["subj"],
                    "total_weight": pc.cast(t["weight"], pa.int64()),
                }
            )
            .group_by(["pred", "subj"], use_threads=False)
            .aggregate([("total_weight", "sum"), ([], "count_all")])
        )
        return g.rename_columns(["pred", "subj", "total_weight", "n_triples"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["pred", "subj"])
        .aggregate(
            Sum("total_weight", alias_name="total_weight"),
            Sum("n_triples", alias_name="n_triples"),
        )
    )

    def fold(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "pred": t["pred"],
                    "total_weight": pc.cast(t["total_weight"], pa.int64()),
                    "n_triples": pc.cast(t["n_triples"], pa.int64()),
                }
            )
            .group_by("pred", use_threads=False)
            .aggregate(
                [("total_weight", "sum"), ("n_triples", "sum"), ([], "count_all")]
            )
        )
        return g.rename_columns(["pred", "total_weight", "n_triples", "n_subjects"])

    from ray.data.aggregate import Count  # noqa: F401  (profile stays distributed)

    out_ds = (
        agg.map_batches(fold, batch_format="pyarrow", batch_size=None)
        .groupby("pred")
        .aggregate(
            Sum("total_weight", alias_name="total_weight"),
            Sum("n_triples", alias_name="n_triples"),
            Sum("n_subjects", alias_name="n_subjects"),
        )
    )
    return out_ds.map_batches(
        lambda t: pa.table(
            {
                "pred": t["pred"],
                "n_triples": pc.cast(t["n_triples"], pa.int64()),
                "total_weight": pc.cast(t["total_weight"], pa.int64()),
                "n_subjects": pc.cast(t["n_subjects"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
