"""Round-4 batch-20 gates: DuckDB value-parity at sf0.001 for the TPC-H
Q5-shape multi-way join and the assistant echo-rate histogram, plus
constructed semantics checks."""

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
    for t in "region nation customer supplier orders lineitem".split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sql = sql.replace(
        "/tmp/chunksilo_ray_testdata/sf0.01-seed42/transcripts.parquet", TP
    )
    return con.execute(sql).fetchdf()


@pytest.mark.parametrize("name", ["q5_revenue_by_nation", "echo_rate_histogram"])
def test_batch20_duckdb_parity(name):
    import __ray_entry__ as E

    got = _as_df(E.queries()[name](SF))
    exp = _oracle(E.oracle_sql()[name])
    assert len(got) > 0
    _assert_value_match(got, exp)


def test_q5_other_region_and_window():
    """Non-default region + window stays oracle-exact (parameters aren't
    baked into the op)."""
    from chunksilo_ray.ops.relational import q5_revenue_by_nation

    got = _as_df(
        q5_revenue_by_nation(
            SF, region="EUROPE", date_from="1997-01-01", date_to="1998-01-01"
        )
    )
    exp = _oracle(
        """SELECT n.n_name AS n_name,
                  ROUND(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
                        / 10000.0, 4) AS revenue
           FROM lineitem l
           JOIN orders o   ON o.o_orderkey = l.l_orderkey
           JOIN customer c ON c.c_custkey = o.o_custkey
           JOIN supplier s ON s.s_suppkey = l.l_suppkey
           JOIN nation n   ON n.n_nationkey = s.s_nationkey
                          AND c.c_nationkey = s.s_nationkey
           JOIN region r   ON r.r_regionkey = n.n_regionkey
           WHERE r.r_name = 'EUROPE'
             AND o.o_orderdate >= TIMESTAMP '1997-01-01'
             AND o.o_orderdate < TIMESTAMP '1998-01-01'
           GROUP BY n.n_name"""
    )
    assert len(got) > 0
    _assert_value_match(got, exp)


def test_echo_constructed(tmp_path):
    """Identical turn pair -> bucket 10; disjoint pair -> bucket 0; half
    overlap -> bucket floor(10*1/3)=3."""
    import pyarrow.parquet as pq
    from chunksilo_ray.ops.window import echo_rate_histogram

    rows = [
        ("c1", 0, "user", "alpha beta"),
        ("c1", 1, "assistant", "alpha beta"),      # jac 1 -> 10
        ("c2", 0, "user", "one two"),
        ("c2", 1, "assistant", "three four"),      # jac 0 -> 0
        ("c3", 0, "user", "shared left"),
        ("c3", 1, "assistant", "shared right"),    # 1/3 -> 3
    ]
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    p = tmp_path / "tp.parquet"
    pq.write_table(t, str(p))
    got = _as_df(echo_rate_histogram(str(p))).set_index("echo_bucket")["n_pairs"]
    assert got.to_dict() == {0: 1, 3: 1, 10: 1}
