"""Round-4 batch-21 gates: DuckDB value-parity at sf0.001 for the TPC-H Q6
scan, event-type bigram mining and the hive-partitioned Parquet roundtrip,
plus layout/semantics checks."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
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
    for t in ("lineitem", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sql = sql.replace("/tmp/chunksilo_ray_kg_out/sf0.01", KG_OUT)
    return con.execute(sql).fetchdf()


@pytest.mark.parametrize(
    "name",
    ["q6_revenue_filtered", "event_type_bigrams", "partitioned_export_roundtrip"],
)
def test_batch21_duckdb_parity(name):
    import __ray_entry__ as E

    got = _as_df(E.queries()[name](SF))
    exp = _oracle(E.oracle_sql()[name])
    assert len(got) > 0
    _assert_value_match(got, exp)


def test_partitioned_layout_is_hive():
    """The export really is one directory per predicate with a _SUCCESS
    marker (the resumable / prunable layout the docstring promises)."""
    import __ray_entry__ as E

    E.queries()["partitioned_export_roundtrip"](SF)  # ensure exported
    root = "/tmp/chunksilo_ray_interchange/part_edges_sf0.001"
    assert os.path.exists(os.path.join(root, "_SUCCESS"))
    parts = [d for d in os.listdir(root) if d.startswith("pred=")]
    preds = set(
        _oracle(
            f"SELECT DISTINCT pred FROM read_parquet('{KG_OUT}/edges_agg/*.parquet')"
        )["pred"]
    )
    assert {d.split("=", 1)[1] for d in parts} == preds


def test_event_bigram_mass():
    """Total bigrams = total events - number of users with >= 1 event."""
    import __ray_entry__ as E

    got = _as_df(E.queries()["event_type_bigrams"](SF))
    n_events, n_users = _oracle(
        "SELECT COUNT(*), COUNT(DISTINCT user_id) FROM events"
    ).iloc[0]
    assert int(got["n_bigrams"].sum()) == int(n_events) - int(n_users)
