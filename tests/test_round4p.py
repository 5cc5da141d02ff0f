"""Round-4 batch-25 gates: DuckDB value-parity at sf0.001 for the
predicate type-signature census and the segment x priority chi-square,
plus constructed semantics checks."""

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
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sql = sql.replace("/tmp/chunksilo_ray_kg_out/sf0.01", KG_OUT)
    return con.execute(sql).fetchdf()


@pytest.mark.parametrize("name", ["kg_type_signature", "segment_priority_chi2"])
def test_batch25_duckdb_parity(name):
    import __ray_entry__ as E

    got = _as_df(E.queries()[name](SF))
    exp = _oracle(E.oracle_sql()[name])
    assert len(got) > 0
    _assert_value_match(got, exp)


def test_type_signature_constructed():
    """Prefix typing incl. the untyped fallback for colon-free entities."""
    import ray.data as rd
    from chunksilo_ray.ops.graph import kg_type_signature

    ea = rd.from_arrow(
        pa.table(
            {
                "subj": pa.array(["person:a", "person:b", "noprefix"], pa.string()),
                "pred": pa.array(["p", "p", "p"], pa.string()),
                "obj": pa.array(["tool:x", "tool:y", "tool:z"], pa.string()),
                "weight": pa.array([2, 3, 1], pa.int64()),
            }
        )
    )
    got = _as_df(kg_type_signature(ea)).set_index(["pred", "subj_type", "obj_type"])
    assert got.loc[("p", "person", "tool"), "n_triples"] == 2
    assert got.loc[("p", "person", "tool"), "total_weight"] == 5
    assert got.loc[("p", "untyped", "tool"), "n_triples"] == 1


def test_chi2_sane():
    import __ray_entry__ as E

    got = _as_df(E.queries()["segment_priority_chi2"](SF)).iloc[0]
    n_orders = _oracle("SELECT COUNT(*) AS n FROM orders")["n"].iloc[0]
    assert got["chi2"] >= 0
    assert got["n_orders"] == int(n_orders)
    segs = _oracle("SELECT COUNT(DISTINCT c_mktsegment) AS n FROM customer")["n"].iloc[0]
    pris = _oracle("SELECT COUNT(DISTINCT o_orderpriority) AS n FROM orders")["n"].iloc[0]
    assert got["dof"] == (int(segs) - 1) * (int(pris) - 1)
