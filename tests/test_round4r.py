"""Round-4 batch-27 gates: DuckDB value-parity at sf0.001 for the weekly
turn-volume curve and the top-users whale report, plus invariants."""

from __future__ import annotations

import duckdb
import pandas as pd
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
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    sql = sql.replace(
        "/tmp/chunksilo_ray_testdata/sf0.01-seed42/transcripts.parquet", TP
    )
    return con.execute(sql).fetchdf()


@pytest.mark.parametrize("name", ["turn_volume_weekly", "top_users_profile"])
def test_batch27_duckdb_parity(name):
    import __ray_entry__ as E

    got = _as_df(E.queries()[name](SF))
    exp = _oracle(E.oracle_sql()[name])
    assert len(got) > 0
    _assert_value_match(got, exp)


def test_turn_volume_mass():
    import __ray_entry__ as E

    got = _as_df(E.queries()["turn_volume_weekly"](SF))
    n_turns, n_chars = _oracle(
        f"SELECT COUNT(*), SUM(length(text)) FROM read_parquet('{TP}')"
    ).iloc[0]
    assert int(got["n_turns"].sum()) == int(n_turns)
    assert int(got["total_chars"].sum()) == int(n_chars)


def test_top_users_ranked_and_exact():
    import __ray_entry__ as E

    got = _as_df(E.queries()["top_users_profile"](SF))
    n_users = int(_oracle("SELECT COUNT(DISTINCT user_id) AS n FROM events")["n"].iloc[0])
    assert len(got) == min(20, n_users)
    c = got["total_cents"].to_numpy()
    assert (c[:-1] >= c[1:]).all()
    spot = _oracle(
        f"""SELECT CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events WHERE user_id = {int(got['user_id'].iloc[0])}"""
    ).iloc[0]
    assert int(got["total_cents"].iloc[0]) == int(spot["c"])
    assert int(got["n_events"].iloc[0]) == int(spot["n"])
