"""Round-4 batch-15 gates: DuckDB value-parity at sf0.001 for the
transcripts-curation additions (prompt/response length correlation,
tool-call journey chains, KG extraction-yield histogram) plus
constructed-positive semantics checks."""

from __future__ import annotations

import duckdb
import numpy as np
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
    "name", ["qa_length_correlation", "conv_tool_chains", "kg_extraction_yield"]
)
def test_batch15_duckdb_parity(name):
    import __ray_entry__ as E

    got = _as_df(E.queries()[name](SF))
    exp = duckdb.connect().execute(_sql01_to_sf0001(E.oracle_sql()[name])).fetchdf()
    assert len(got) > 0
    _assert_value_match(got, exp)


# ---------------------------------------------------------------- semantics


def test_qa_corr_constructed(tmp_path):
    """Perfectly proportional prompt/response lengths -> r == 1.0; the pair
    count excludes non-adjacent and wrong-role adjacencies."""
    from chunksilo_ray.ops.window import qa_length_correlation
    import pyarrow.parquet as pq

    rows = []
    for c, scale in (("c1", 1), ("c2", 2), ("c3", 3)):
        rows += [
            (c, 0, "user", "u" * (10 * scale), ""),
            (c, 1, "assistant", "a" * (20 * scale), ""),
            (c, 2, "tool", "t" * 5, "bash"),          # breaks adjacency
            (c, 3, "assistant", "a" * 7, ""),          # no preceding user
        ]
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([r[4] for r in rows], pa.string()),
        }
    )
    p = tmp_path / "tp.parquet"
    pq.write_table(t, str(p))
    got = _as_df(qa_length_correlation(str(p)))
    assert int(got["n_pairs"].iloc[0]) == 3
    assert got["qa_len_corr"].iloc[0] == 1.0


def test_tool_chains_counts_and_rank():
    import __ray_entry__ as E

    got = _as_df(E.queries()["conv_tool_chains"](SF))
    assert len(got) <= 50
    # ranked (n DESC, chain ASC)
    n = got["n_convs"].to_numpy()
    assert (n[:-1] >= n[1:]).all()
    # every chain is '>'-joined known tool names
    tools = {"bash", "python", "edit", "browser", "search", "grep"}
    for chain in got["chain"]:
        assert set(chain.split(">")) <= tools


def test_extraction_yield_spine_is_all_convs():
    """Histogram counts sum to the number of DISTINCT conversations in the
    transcripts (the left spine), regardless of edge coverage."""
    import __ray_entry__ as E

    got = _as_df(E.queries()["kg_extraction_yield"](SF))
    n_convs = duckdb.connect().execute(
        f"SELECT COUNT(DISTINCT conv_id) FROM read_parquet('{TP}')"
    ).fetchone()[0]
    assert int(got["n_convs"].sum()) == n_convs
    assert (got["yield_bucket"] >= 0).all() and (got["yield_bucket"] <= 50).all()
