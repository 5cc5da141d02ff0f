"""Round-4 batch-14 gates: DuckDB value-parity at sf0.001 for the KG
analytics additions (edge lifespan via the big x big partitioned hash join,
per-predicate schema profile with distributed distinct counts, Newman degree
assortativity) plus constructed-positive semantics checks."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from chunksilo_ray import queries as Q

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


def _kg(name):
    import __ray_entry__ as E

    return Q._kg_result(SF)[name]


def _sql01_to_sf0001(sql: str) -> str:
    """The registered oracles point at the sf0.01 checkpoint paths (the
    driver's scale); retarget them to this test's sf0.001 artifacts."""
    return sql.replace("/tmp/chunksilo_ray_kg_out/sf0.01", KG_OUT).replace(
        "/tmp/chunksilo_ray_testdata/sf0.01-seed42/transcripts.parquet", TP
    )


@pytest.mark.parametrize(
    "name", ["kg_edge_lifespan", "kg_schema_profile", "kg_degree_assortativity"]
)
def test_batch14_duckdb_parity(name):
    import __ray_entry__ as E

    got = _as_df(E.queries()[name](SF))
    exp = duckdb.connect().execute(_sql01_to_sf0001(E.oracle_sql()[name])).fetchdf()
    assert len(got) > 0
    _assert_value_match(got, exp)


# ---------------------------------------------------------------- semantics


def test_lifespan_bounds_first_witness():
    """last >= first everywhere; single-mention triples have span 0; the
    first_ts_us column agrees with kg_edge_timestamps' value oracle."""
    import __ray_entry__ as E

    got = _as_df(E.queries()["kg_edge_lifespan"](SF))
    assert (got["last_ts_us"] >= got["first_ts_us"]).all()
    assert (got["span_us"] == got["last_ts_us"] - got["first_ts_us"]).all()
    single = got[got["n_mentions"] == 1]
    assert len(single) > 0
    assert (single["span_us"] == 0).all()


def test_schema_profile_totals_match_edges_agg():
    got = _as_df(_kg_sp())
    ea = _as_df(_kg("edges_agg").to_pandas() if hasattr(_kg("edges_agg"), "to_pandas") else _kg("edges_agg"))
    assert int(got["n_triples"].sum()) == len(ea)
    assert int(got["total_weight"].sum()) == int(ea["weight"].sum())
    assert (got["n_subj"] <= got["n_triples"]).all()
    assert (got["n_obj"] <= got["n_triples"]).all()


def _kg_sp():
    from chunksilo_ray.ops.graph import kg_schema_profile

    return kg_schema_profile(_kg("edges_agg"))


def test_assortativity_constructed_star_vs_chain():
    """A star graph is maximally disassortative (hub pairs with leaves
    only): r must be strongly negative; a cycle (all degrees equal) has
    undefined r (zero variance) -> NaN."""
    from chunksilo_ray.ops.graph import kg_degree_assortativity
    import ray.data as rd

    def ea_of(pairs):
        return rd.from_arrow(
            pa.table(
                {
                    "subj": pa.array([p[0] for p in pairs], pa.string()),
                    "pred": pa.array(["rel"] * len(pairs), pa.string()),
                    "obj": pa.array([p[1] for p in pairs], pa.string()),
                    "weight": pa.array([1] * len(pairs), pa.int64()),
                }
            )
        )

    star = ea_of([("hub", f"leaf{i}") for i in range(8)])
    r_star = _as_df(kg_degree_assortativity(star))["assortativity"].iloc[0]
    assert r_star == -1.0  # pure star: exactly anti-correlated endpoint degrees

    cycle = ea_of([(f"n{i}", f"n{(i + 1) % 5}") for i in range(5)])
    r_cycle = _as_df(kg_degree_assortativity(cycle))["assortativity"].iloc[0]
    assert np.isnan(r_cycle)  # all degrees equal -> zero variance


def test_assortativity_degree_guard():
    from chunksilo_ray.ops.graph import kg_degree_assortativity
    import ray.data as rd

    ea = rd.from_arrow(
        pa.table(
            {
                "subj": pa.array(["a", "b"], pa.string()),
                "pred": pa.array(["r", "r"], pa.string()),
                "obj": pa.array(["b", "c"], pa.string()),
                "weight": pa.array([1, 1], pa.int64()),
            }
        )
    )
    with pytest.raises(ValueError, match="max_nodes"):
        kg_degree_assortativity(ea, max_nodes=2)
