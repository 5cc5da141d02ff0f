"""Round-4 batch-28 gates: DuckDB value-parity at sf0.001 for the
first-tool opener distribution and the lineitems-per-order histogram, plus
constructed checks."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")

SF = "/root/testdata/sf0.001"
TP = "/tmp/chunksilo_ray_testdata/sf0.001-seed42/transcripts.parquet"


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
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')"
    )
    sql = sql.replace(
        "/tmp/chunksilo_ray_testdata/sf0.01-seed42/transcripts.parquet", TP
    )
    return con.execute(sql).fetchdf()


@pytest.mark.parametrize("name", ["first_tool_distribution", "order_size_histogram"])
def test_batch28_duckdb_parity(name):
    import __ray_entry__ as E

    got = _as_df(E.queries()[name](SF))
    exp = _oracle(E.oracle_sql()[name])
    assert len(got) > 0
    _assert_value_match(got, exp)


def test_first_tool_constructed(tmp_path):
    """Earliest tool turn wins; conversations without tools count as
    '<none>'."""
    import pyarrow.parquet as pq
    from chunksilo_ray.ops.window import first_tool_distribution

    rows = [
        ("c1", 0, "user", ""), ("c1", 1, "tool", "bash"), ("c1", 2, "tool", "grep"),
        ("c2", 0, "user", ""), ("c2", 3, "tool", "grep"), ("c2", 1, "tool", "edit"),
        ("c3", 0, "user", ""), ("c3", 1, "assistant", ""),
    ]
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "tool": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    p = tmp_path / "tp.parquet"
    pq.write_table(t, str(p))
    got = _as_df(first_tool_distribution(str(p))).set_index("first_tool")["n_convs"]
    assert got.to_dict() == {"bash": 1, "edit": 1, "<none>": 1}


def test_order_size_mass():
    import __ray_entry__ as E

    got = _as_df(E.queries()["order_size_histogram"](SF))
    n_li, n_ord = _oracle(
        "SELECT COUNT(*), COUNT(DISTINCT l_orderkey) FROM lineitem"
    ).iloc[0]
    assert int((got["n_items"] * got["n_orders"]).sum()) == int(n_li)
    assert int(got["n_orders"].sum()) == int(n_ord)
