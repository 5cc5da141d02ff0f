"""Round-4 batch-18 gates: DuckDB value-parity at sf0.001 for incremental
KG compaction (merge == one-shot aggregate), transcript sessionization and
the turn-integrity audit, plus constructed semantics checks."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")

SF = "/root/testdata/sf0.001"
KG_OUT = "/tmp/chunksilo_ray_kg_out/sf0.001"
TP = "/tmp/chunksilo_ray_testdata/sf0.001-seed42/transcripts.parquet"


def _as_df(res) -> pd.DataFrame:
    return res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)


def _assert_value_match(ray_df: pd.DataFrame, ora_df: pd.DataFrame):
    assert sorted(ray_df.columns) == sorted(ora_df.columns)
    cols = sorted(ray_df.columns)
    a = ray_df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    b = ora_df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, rtol=1e-9, atol=1e-9)


def _sql01_to_sf0001(sql: str) -> str:
    return sql.replace("/tmp/chunksilo_ray_kg_out/sf0.01", KG_OUT).replace(
        "/tmp/chunksilo_ray_testdata/sf0.01-seed42/transcripts.parquet", TP
    )


@pytest.mark.parametrize(
    "name", ["kg_incremental_update", "transcript_sessionize", "turn_integrity_audit"]
)
def test_batch18_duckdb_parity(name):
    import __ray_entry__ as E

    got = _as_df(E.queries()[name](SF))
    exp = duckdb.connect().execute(_sql01_to_sf0001(E.oracle_sql()[name])).fetchdf()
    assert len(got) > 0
    _assert_value_match(got, exp)


# ---------------------------------------------------------------- semantics


def test_merge_edges_agg_constructed():
    """Overlapping triple weights add; delta-only triples appear."""
    import ray.data as rd
    from chunksilo_ray.stages.materialize import merge_edges_agg

    base = rd.from_arrow(
        pa.table(
            {
                "subj": pa.array(["a", "b"], pa.string()),
                "pred": pa.array(["p", "p"], pa.string()),
                "obj": pa.array(["x", "y"], pa.string()),
                "weight": pa.array([5, 2], pa.int64()),
            }
        )
    )
    delta = rd.from_arrow(
        pa.table(
            {
                "subj": pa.array(["a", "a", "c"], pa.string()),
                "pred": pa.array(["p", "p", "q"], pa.string()),
                "obj": pa.array(["x", "x", "z"], pa.string()),
                "weight": pa.array([1, 1, 1], pa.int64()),
            }
        )
    )
    got = (
        _as_df(merge_edges_agg(base, delta))
        .set_index(["subj", "pred", "obj"])["weight"]
        .to_dict()
    )
    assert got == {("a", "p", "x"): 7, ("b", "p", "y"): 2, ("c", "q", "z"): 1}


def test_sessionize_constructed(tmp_path):
    """One conv split at a 31-min gap into sessions of 2 and 1 turns; a
    second conv stays whole."""
    import numpy as np
    import pyarrow.parquet as pq
    from chunksilo_ray.ops.window import transcript_sessionize

    base = np.datetime64("2026-01-01T00:00:00", "us")
    rows = [
        ("c1", 0, base),
        ("c1", 1, base + np.timedelta64(60, "s")),
        ("c1", 2, base + np.timedelta64(60 + 31 * 60, "s")),  # 31-min gap
        ("c2", 0, base),
        ("c2", 1, base + np.timedelta64(5, "s")),
    ]
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        }
    )
    p = tmp_path / "tp.parquet"
    pq.write_table(t, str(p))
    got = _as_df(transcript_sessionize(str(p))).set_index("session_turns")[
        "n_sessions"
    ]
    assert got.to_dict() == {1: 1, 2: 2}


def test_integrity_audit_constructed(tmp_path):
    """Dup idx, gapped idx and nonzero start each counted once."""
    import pyarrow.parquet as pq
    from chunksilo_ray.ops.window import turn_integrity_audit

    rows = [
        ("good", 0), ("good", 1),
        ("dup", 0), ("dup", 0), ("dup", 1),
        ("gapped", 0), ("gapped", 2),
        ("late", 3), ("late", 4),
    ]
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "ts": pa.array([0] * len(rows), pa.timestamp("us")),
        }
    )
    p = tmp_path / "tp.parquet"
    pq.write_table(t, str(p))
    got = _as_df(turn_integrity_audit(str(p))).iloc[0]
    assert got["n_convs"] == 4
    assert got["n_dup_idx"] == 1
    assert got["n_gapped"] == 1
    assert got["n_nonzero_start"] == 1
