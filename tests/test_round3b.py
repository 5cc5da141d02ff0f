"""Round-3 batch-2 gates: DuckDB value-parity for the operators registered
past the driver's 50-query evaluation prefix — two-big-sides shuffle join,
JSON-prop flattening, INTERSECT, grouped p95 / correlation, sequence
packing, int8 vector quantization, first-seen acquisition curve. Each gate
runs the Ray operator and its oracle SQL from __ray_entry__ over the same
parquet and asserts column-sorted value equality (the driver's compare)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")

SF = "/root/testdata/sf0.001"
TABLES = ("customer", "orders", "lineitem", "events", "documents", "embeddings")

BATCH2 = [
    "q3_top_orders",
    "props_key_histogram",
    "users_click_and_purchase",
    "p95_value_by_type",
    "corr_value_hour_by_type",
    "pack_sequences",
    "quantize_embeddings",
    "daily_new_users",
]


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con.execute(sql).fetchdf()


def _as_df(res) -> pd.DataFrame:
    return res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)


@pytest.mark.parametrize("name", BATCH2)
def test_batch2_matches_duckdb(name):
    import __ray_entry__ as E

    got = _as_df(E.queries()[name](SF))
    exp = _oracle(E.oracle_sql()[name])
    assert len(got) > 0
    assert sorted(got.columns) == sorted(exp.columns)
    cols = sorted(got.columns)
    a = got[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    b = exp[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, rtol=1e-9, atol=1e-9)


def test_pack_sequences_budget_semantics():
    """Constructed positive: the packing boundary falls where the exclusive
    prefix crosses the budget, docs straddle deterministically, and a
    non-default bucket width changes nothing (bucketing is an execution
    detail, not a semantics knob)."""
    from chunksilo_ray.ops.textstats import pack_sequences

    a = _as_df(pack_sequences(SF, budget=512)).sort_values("doc_id").reset_index(drop=True)
    b = _as_df(pack_sequences(SF, budget=512, bucket_width=17)).sort_values(
        "doc_id"
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # seq ids are nondecreasing in doc order and start at 0
    assert a["seq_id"].iloc[0] == 0
    assert (a["seq_id"].diff().dropna() >= 0).all()
    assert a["seq_id"].max() > 0  # the budget binds at this corpus size
    # exclusive-prefix law: seq_id == cumsum-before // budget
    cum = a["n_tokens"].cumsum().shift(fill_value=0)
    assert (a["seq_id"] == cum // 512).all()


def test_q3_shuffle_join_sides_are_post_filter():
    """The join feeds PRE-AGGREGATED lineitem revenue (one row per
    orderkey), not raw lineitem — the at-scale guarantee the docstring
    claims. Verified via the public result: revenues equal the oracle's
    grouped sums (covered by the parity gate) and orderkeys are unique."""
    import __ray_entry__ as E

    got = _as_df(E.queries()["q3_top_orders"](SF))
    assert got["l_orderkey"].is_unique
