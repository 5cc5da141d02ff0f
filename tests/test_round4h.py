"""Round-4 batch-17 gates: DuckDB value-parity at sf0.001 for the KG
temporal-growth curve, per-predicate entity-role card, degree histogram and
per-tool execution-latency profile, plus constructed semantics checks."""

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
    "name",
    [
        "kg_temporal_growth",
        "kg_entity_roles",
        "kg_degree_histogram",
        "tool_latency_profile",
    ],
)
def test_batch17_duckdb_parity(name):
    import __ray_entry__ as E

    got = _as_df(E.queries()[name](SF))
    exp = duckdb.connect().execute(_sql01_to_sf0001(E.oracle_sql()[name])).fetchdf()
    assert len(got) > 0
    _assert_value_match(got, exp)


# ---------------------------------------------------------------- semantics


def test_entity_roles_constructed():
    """b is subject AND object under p; q has disjoint sides."""
    import ray.data as rd
    from chunksilo_ray.ops.graph import kg_entity_roles

    ea = rd.from_arrow(
        pa.table(
            {
                "subj": pa.array(["a", "b", "x"], pa.string()),
                "pred": pa.array(["p", "p", "q"], pa.string()),
                "obj": pa.array(["b", "c", "y"], pa.string()),
                "weight": pa.array([1, 1, 1], pa.int64()),
            }
        )
    )
    got = _as_df(kg_entity_roles(ea)).set_index("pred")
    assert got.loc["p"].tolist() == [2, 2, 1]  # subj {a,b}, obj {b,c}, both {b}
    assert got.loc["q"].tolist() == [1, 1, 0]


def test_degree_histogram_mass():
    """Sum over the histogram = number of distinct KG nodes; degree mass =
    2x triple count (every triple contributes one out and one in)."""
    import __ray_entry__ as E

    got = _as_df(E.queries()["kg_degree_histogram"](SF))
    stats = duckdb.connect().execute(
        f"""SELECT (SELECT COUNT(DISTINCT node) FROM (
                SELECT subj AS node FROM read_parquet('{KG_OUT}/edges_agg/*.parquet')
                UNION SELECT obj FROM read_parquet('{KG_OUT}/edges_agg/*.parquet'))),
               (SELECT COUNT(*) FROM read_parquet('{KG_OUT}/edges_agg/*.parquet'))"""
    ).fetchone()
    assert int(got["n_nodes"].sum()) == stats[0]
    assert int((got["degree"] * got["n_nodes"]).sum()) == 2 * stats[1]


def test_temporal_growth_totals():
    """New-triples-per-day sums to the distinct triple count."""
    import __ray_entry__ as E

    got = _as_df(E.queries()["kg_temporal_growth"](SF))
    n_triples = duckdb.connect().execute(
        f"SELECT COUNT(*) FROM read_parquet('{KG_OUT}/edges_agg/*.parquet')"
    ).fetchone()[0]
    assert int(got["n_new_triples"].sum()) == n_triples
    assert (got["n_new_triples"] > 0).all()


def test_tool_latency_nonnegative_and_bounded():
    import __ray_entry__ as E

    got = _as_df(E.queries()["tool_latency_profile"](SF))
    assert (got["sum_gap_us"] >= got["max_gap_us"]).all()
    assert (got["max_gap_us"] * got["n_pairs"] >= got["sum_gap_us"]).all()
    assert (got["sum_gap_us"] >= 0).all()
