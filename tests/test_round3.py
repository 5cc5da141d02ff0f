"""Round-3 gates: DuckDB value-parity for the ops registered past the
driver's 50-query evaluation prefix (tfidf / per-lang cap / pagerank) — the
pytest side of the oracle story, so their correctness is checked even when
the driver's correctness gate never reaches them."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")

SF = "/root/testdata/sf0.001"


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("documents", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con.execute(sql).fetchdf()


def _as_df(res) -> pd.DataFrame:
    return res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)


def _assert_value_match(ray_df: pd.DataFrame, ora_df: pd.DataFrame):
    assert sorted(ray_df.columns) == sorted(ora_df.columns)
    cols = sorted(ray_df.columns)
    a = ray_df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    b = ora_df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, rtol=1e-9, atol=1e-9)


def test_tfidf_top_terms_matches_duckdb():
    import __ray_entry__ as E
    from chunksilo_ray.ops.textstats import tfidf_top_terms

    got = _as_df(tfidf_top_terms(SF).to_pandas())
    exp = _oracle(E.oracle_sql()["tfidf_top_terms"])
    assert len(got) > 0
    _assert_value_match(got, exp)


def test_cap_docs_per_lang_matches_duckdb():
    import __ray_entry__ as E
    from chunksilo_ray.ops.textstats import cap_docs_per_lang

    got = _as_df(cap_docs_per_lang(SF).to_pandas())
    exp = _oracle(E.oracle_sql()["cap_docs_per_lang"])
    assert len(got) > 0
    # the cap binds for at least one language at this sf (500 docs, 5 langs)
    assert got.groupby("lang").size().max() == 50
    _assert_value_match(got, exp)


def test_pagerank_part_supplier_matches_duckdb():
    import __ray_entry__ as E
    from chunksilo_ray.ops.graph import pagerank_part_supplier

    got = _as_df(pagerank_part_supplier(SF).to_pandas())
    exp = _oracle(E.oracle_sql()["pagerank_part_supplier"])
    assert len(got) > 0
    assert set(got["kind"]) == {"part", "supplier"}
    # mass conservation: mean of the ×N-normalized ranks is 1.0
    assert abs(got["pr"].mean() - 1.0) < 1e-3
    _assert_value_match(got, exp)


def test_string_key_join_both_paths_agree():
    """Round-3 join generalization: string keys work on both the broadcast
    and the shuffle-fallback path with identical schema and values (tfidf's
    term-df attach relies on this)."""
    import pyarrow as pa
    import ray.data as rd

    from chunksilo_ray.ops.relational import broadcast_inner_join

    fact = rd.from_arrow(
        pa.table(
            {
                "v": pa.array([1.0, 2.0, 3.0, 4.0]),
                "term": pa.array(["alpha", "beta", "alpha", "zz-missing"]),
            }
        )
    )
    dim = pd.DataFrame({"term": ["alpha", "beta", "gamma"], "df": [10, 20, 30]})
    b = broadcast_inner_join(fact, "term", dim, "term", ["df"])
    s = broadcast_inner_join(fact, "term", dim, "term", ["df"], broadcast_limit=0)
    assert b.schema().names == s.schema().names == ["v", "term", "df"]
    key = lambda r: (r["term"], r["v"], r["df"])  # noqa: E731
    rows_b, rows_s = sorted(map(key, b.take_all())), sorted(map(key, s.take_all()))
    assert rows_b == rows_s
    assert len(rows_b) == 3  # zz-missing dropped on both paths


def test_heavy_hitter_users_matches_duckdb():
    import __ray_entry__ as E
    from chunksilo_ray.ops.sketches import heavy_hitter_users

    got = _as_df(heavy_hitter_users(SF).to_pandas())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    exp = con.execute(E.oracle_sql()["heavy_hitter_users"]).fetchdf()
    assert len(got) > 0  # threshold 75 binds at sf0.001 (p90 ~ 78 events/user)
    _assert_value_match(got, exp)


def test_heavy_hitter_cms_prunes_but_never_drops():
    """With an adversarially tiny threshold the CMS keeps everyone (exact
    = plain groupby); sanity that the sketch path composes with exactness."""
    from chunksilo_ray.ops.sketches import heavy_hitter_users

    got = _as_df(heavy_hitter_users(SF, threshold=1).to_pandas())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    exp = con.execute(
        "SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id"
    ).fetchdf()
    _assert_value_match(got, exp)


def _oracle_t(sql: str, tables: tuple[str, ...]) -> pd.DataFrame:
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con.execute(sql).fetchdf()


def test_orders_left_rich_segment_matches_duckdb_both_paths():
    """LEFT join null bucket: broadcast path and shuffle fallback must both
    match the SQL LEFT JOIN (incl. the NULL-segment row)."""
    import __ray_entry__ as E
    from chunksilo_ray.ops.relational import orders_left_rich_segment

    exp = _oracle_t(E.oracle_sql()["orders_left_rich_segment"], ("orders", "customer"))
    assert exp["segment"].isna().any()  # the filter actually produces nulls
    for limit in (None, 0):  # None = broadcast, 0 = forced shuffle fallback
        kw = {} if limit is None else {"broadcast_limit": 0}
        got = _as_df(orders_left_rich_segment(SF, **kw).to_pandas())
        _assert_value_match(got, exp)


def test_rollup_orders_matches_duckdb():
    import __ray_entry__ as E
    from chunksilo_ray.ops.relational import rollup_orders_by_year_priority

    got = _as_df(rollup_orders_by_year_priority(SF).to_pandas())
    exp = _oracle_t(E.oracle_sql()["rollup_orders"], ("orders",))
    # all three rollup levels present: finest, per-year, grand total
    assert got["o_orderpriority"].isna().sum() > 1
    assert got["order_year"].isna().sum() == 1
    _assert_value_match(got, exp)


def test_lag_delta_per_user_matches_duckdb():
    import __ray_entry__ as E
    from chunksilo_ray.ops.window import lag_delta_per_user

    got = _as_df(lag_delta_per_user(SF).to_pandas())
    exp = _oracle_t(E.oracle_sql()["lag_delta_per_user"], ("events",))
    assert got["prev_value"].isna().sum() > 0  # first event per user
    _assert_value_match(got, exp)


def test_kg_entity_pagerank_matches_duckdb():
    """PageRank over the FLAGSHIP KG's own entity graph, oracled by unrolled
    power-iteration CTEs over the written edges_agg checkpoint (string
    node keys) — the graph op composes with the KG outputs end to end."""
    import __ray_entry__ as E
    from chunksilo_ray import oracles as O

    got = _as_df(E.queries()["kg_entity_pagerank"](SF).to_pandas())
    exp = duckdb.connect().execute(
        O._kg_pagerank_sql("/tmp/chunksilo_ray_kg_out/sf0.001")
    ).fetchdf()
    assert len(got) > 100
    assert abs(got["pr"].mean() - 1.0) < 1e-3  # mass conservation, xN scale
    _assert_value_match(got, exp)
