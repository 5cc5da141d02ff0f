"""Round-4 batch-23 gates: DuckDB value-parity at sf0.001 for the GraphRAG
entity-card point lookup and 2-hop ego-subgraph retrieval, plus constructed
semantics checks."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")

SF = "/root/testdata/sf0.001"
KG_OUT = "/tmp/chunksilo_ray_kg_out/sf0.001"


def _as_df(res) -> pd.DataFrame:
    return res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)


def _assert_value_match(ray_df: pd.DataFrame, ora_df: pd.DataFrame):
    assert sorted(ray_df.columns) == sorted(ora_df.columns)
    cols = sorted(ray_df.columns)
    a = ray_df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    b = ora_df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, rtol=1e-9, atol=1e-9)


def _oracle(sql: str) -> pd.DataFrame:
    sql = sql.replace("/tmp/chunksilo_ray_kg_out/sf0.01", KG_OUT)
    return duckdb.connect().execute(sql).fetchdf()


@pytest.mark.parametrize("name", ["kg_entity_card", "kg_ego_subgraph"])
def test_batch23_duckdb_parity(name):
    import __ray_entry__ as E

    got = _as_df(E.queries()[name](SF))
    exp = _oracle(E.oracle_sql()[name])
    assert len(got) > 0
    _assert_value_match(got, exp)


def _tiny_ea():
    import ray.data as rd

    rows = [
        ("s", "p", "a"), ("b", "p", "s"),        # 1-hop: a, b
        ("a", "q", "x"), ("y", "q", "b"),        # 2-hop edges via a/b
        ("x", "p", "y"),                          # outside: x,y not in n1
        ("u", "p", "v"),                          # disconnected
    ]
    return rd.from_arrow(
        pa.table(
            {
                "subj": pa.array([r[0] for r in rows], pa.string()),
                "pred": pa.array([r[1] for r in rows], pa.string()),
                "obj": pa.array([r[2] for r in rows], pa.string()),
                "weight": pa.array([1] * len(rows), pa.int64()),
            }
        )
    )


def test_ego_subgraph_constructed():
    from chunksilo_ray.ops.graph import kg_ego_subgraph

    got = _as_df(kg_ego_subgraph(_tiny_ea(), seed="s"))
    triples = set(map(tuple, got[["subj", "pred", "obj"]].to_numpy()))
    assert triples == {
        ("s", "p", "a"),
        ("b", "p", "s"),
        ("a", "q", "x"),   # endpoint a is 1-hop
        ("y", "q", "b"),   # endpoint b is 1-hop
    }


def test_entity_card_constructed():
    from chunksilo_ray.ops.graph import kg_entity_card

    got = _as_df(kg_entity_card(_tiny_ea(), entity="s"))
    assert got[got["direction"] == "out"]["other"].tolist() == ["a"]
    assert got[got["direction"] == "in"]["other"].tolist() == ["b"]
