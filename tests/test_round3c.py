"""Round-3 batch-5 gates: DuckDB value-parity for the operators registered
past the driver's evaluation prefix — PIVOT, keep-latest CDC compaction,
clickstream paths, mergeable histogram, deterministic binned-quantile
sketch, Arrow-kernel text normalization, per-lang percentile filter — plus
constructed-positive semantics checks (tie-breaking, sketch error bound)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")

SF = "/root/testdata/sf0.001"
TABLES = ("customer", "orders", "lineitem", "events", "documents", "embeddings")

BATCH5 = [
    "pivot_events_daily",
    "latest_event_per_user_type",
    "event_path_per_user",
    "value_histogram",
    "approx_quantiles_value",
    "normalize_docs",
    "long_docs_per_lang",
    # batch 6
    "distinct_users_by_type",
    "zscore_values_by_type",
    "cume_dist_value_by_type",
]


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con.execute(sql).fetchdf()


def _as_df(res) -> pd.DataFrame:
    return res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)


@pytest.mark.parametrize("name", BATCH5)
def test_batch5_matches_duckdb(name):
    import __ray_entry__ as E

    got = _as_df(E.queries()[name](SF))
    exp = _oracle(E.oracle_sql()[name])
    assert len(got) > 0
    assert sorted(got.columns) == sorted(exp.columns)
    cols = sorted(got.columns)
    a = got[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    b = exp[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, rtol=1e-9, atol=1e-9)


def test_latest_event_tie_breaking(tmp_path):
    """Constructed positive: two events share (user, type, ts) — the larger
    event_id must win (last-writer-wins determinism), and a later ts beats
    any event_id."""
    from chunksilo_ray.ops.window import latest_event_per_user_type

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 10],
            "ts": [t0, t0, t0 + pd.Timedelta(hours=1), t0],
            "user_id": [7, 7, 7, 7],
            "event_type": ["click", "click", "click", "view"],
            "value": [1.0, 2.0, 3.0, 4.0],
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    pa.Table.from_pandas(df).to_pandas().to_parquet(sf / "events.parquet", index=False)
    out = latest_event_per_user_type(str(sf)).to_pandas().sort_values("event_type")
    # click: event 3 (later ts) wins over the id-3 tie pool; view: event 10
    assert out["event_id"].tolist() == [3, 10]
    assert out["value"].tolist() == [3.0, 4.0]

    # drop event 3: now ids 1 and 2 tie on ts — 2 must win
    df2 = df[df.event_id != 3]
    df2.to_parquet(sf / "events.parquet", index=False)
    out2 = latest_event_per_user_type(str(sf)).to_pandas().sort_values("event_type")
    assert out2["event_id"].tolist() == [2, 10]


def test_quantile_sketch_error_bound():
    """The binned estimate must sit within one bin width above the exact
    quantile (upper-edge rule): est - width < exact_disc <= est."""
    import __ray_entry__ as E

    got = _as_df(E.queries()["approx_quantiles_value"](SF))
    exact = _oracle(
        """
        SELECT event_type, unnest([0.5, 0.9, 0.99]) AS q,
               unnest([quantile_disc(value, 0.5), quantile_disc(value, 0.9),
                       quantile_disc(value, 0.99)]) AS exact_q
        FROM events GROUP BY event_type
        """
    )
    m = got.merge(exact, on=["event_type", "q"])
    assert len(m) == len(got)
    assert ((m["est"] - m["exact_q"]) <= 0.25 + 1e-9).all()
    assert ((m["est"] - m["exact_q"]) > -1e-9).all()


def test_event_path_prefix_semantics(tmp_path):
    """A user with more than k events keeps only the first k in
    (ts, event_id) order; ties on ts order by event_id."""
    from chunksilo_ray.ops.window import event_path_per_user

    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "event_id": list(range(10)),
            "ts": [t0] * 2 + [t0 + pd.Timedelta(minutes=i) for i in range(1, 9)],
            "user_id": [5] * 10,
            "event_type": [f"t{i}" for i in range(10)],
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    df.to_parquet(sf / "events.parquet", index=False)
    out = event_path_per_user(str(sf), k=3).to_pandas()
    assert out["path"].tolist() == ["t0>t1>t2"]


def test_long_docs_threshold_is_group_local():
    """Each lang's cut is its own decile: every kept doc must reach its own
    lang's ceil(0.9*n) rank, and the kept fraction per lang is ~10%."""
    import __ray_entry__ as E

    got = _as_df(E.queries()["long_docs_per_lang"](SF))
    all_docs = _oracle("SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1")
    kept = got.groupby("lang").size().rename("k").reset_index()
    m = all_docs.merge(kept, on="lang")
    frac = m["k"] / m["n"]
    assert (frac <= 0.2).all() and (frac > 0.0).all()


def test_normalize_docs_kernel(tmp_path):
    from chunksilo_ray.ops.curation import normalize_docs

    df = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["  Hello\t\tWORLD \r\n twice  ", "\n\nAbc\n"],
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    df.to_parquet(sf / "documents.parquet", index=False)
    out = normalize_docs(str(sf)).to_pandas().sort_values("doc_id")
    assert out["norm_text"].tolist() == ["hello world twice", "abc"]
    assert out["n_chars_norm"].tolist() == [17, 3]
