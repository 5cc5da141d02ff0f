"""Round-4 batch-13 gates: DuckDB value-parity at sf0.001 for the five new
operators (prefix-filtered fuzzy name join, CUBE grouping sets, distributed
full-outer join, MAD robust outliers, BPE byte-pair counts) plus
constructed-positive semantics checks — exact recall of the prefix filter on
a hand-built near-dup name table, both NULL directions of the outer join,
cube grand-total consistency, and a hand-countable BPE corpus."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")

SF = "/root/testdata/sf0.001"

PARITY = [
    "fuzzy_name_matches",
    "cube_orders",
    "full_outer_daily_activity",
    "mad_value_by_type",
    "bpe_pair_counts",
]


def _as_df(res) -> pd.DataFrame:
    return res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)


def _assert_value_match(ray_df: pd.DataFrame, ora_df: pd.DataFrame):
    assert sorted(ray_df.columns) == sorted(ora_df.columns)
    cols = sorted(ray_df.columns)
    a = ray_df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    b = ora_df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("name", PARITY)
def test_batch13_duckdb_parity(name):
    import __ray_entry__ as E

    got = _as_df(E.queries()[name](SF))
    con = duckdb.connect()
    for t in ("part", "orders", "events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    exp = con.execute(E.oracle_sql()[name]).fetchdf()
    assert len(got) > 0
    _assert_value_match(got, exp)


# ---------------------------------------------------------------- semantics


def test_fuzzy_prefix_filter_exact_recall(tmp_path):
    """Prefix filtering must find EVERY pair above threshold (no LSH miss):
    brute-force trigram jaccard over a constructed near-dup name table
    equals the operator's output exactly."""
    from chunksilo_ray.ops.dedup import fuzzy_name_matches

    names = [
        "grey steel widget",
        "gray steel widget",   # 1-char edit of the first
        "grey steel widgets",  # suffix edit
        "blue ceramic bolt",
        "blue ceramic bolts",
        "completely different",
        "grey steel widget",   # exact dup -> same rep, no self-pair
    ]
    t = pa.table(
        {
            "p_partkey": pa.array(range(1, len(names) + 1), pa.int64()),
            "p_name": pa.array(names, pa.string()),
        }
    )
    d = tmp_path / "fuzzdir"
    d.mkdir()
    pq.write_table(t, str(d / "part.parquet"))

    got = _as_df(fuzzy_name_matches(str(d), threshold=0.5))

    # brute force over distinct names (min-partkey representative)
    reps: dict[str, int] = {}
    for pk, n in zip(range(1, len(names) + 1), names):
        reps.setdefault(n.lower(), pk)

    def tris(s: str) -> set:
        return {s[i : i + 3] for i in range(max(len(s) - 2, 1))}

    expect = set()
    items = sorted(reps.items(), key=lambda kv: kv[1])
    for i in range(len(items)):
        for j in range(i + 1, len(items)):
            a, b = tris(items[i][0]), tris(items[j][0])
            inter = len(a & b)
            if inter and inter / (len(a) + len(b) - inter) >= 0.5:
                expect.add((items[i][1], items[j][1]))
    assert expect, "fixture must contain matches"
    got_pairs = {(int(r.pk1), int(r.pk2)) for r in got.itertuples()}
    assert got_pairs == expect
    # jaccard values are exact ratios of trigram counts
    for r in got.itertuples():
        assert r.jac == round(r.inter / r.uni, 6)
        assert r.jac >= 0.5


def test_full_outer_has_both_null_directions():
    import __ray_entry__ as E

    got = _as_df(E.queries()["full_outer_daily_activity"](SF))
    # orders (1992-1998) and events (recent window) barely overlap: both
    # null directions must be present, and never both-null
    assert got["n_orders"].isna().any()
    assert got["n_events"].isna().any()
    assert not (got["n_orders"].isna() & got["n_events"].isna()).any()
    assert got["day"].is_unique


def test_cube_grand_total_consistent():
    import __ray_entry__ as E

    got = _as_df(E.queries()["cube_orders"](SF))
    finest = got[got["order_year"].notna() & got["o_orderpriority"].notna()]
    total = got[got["order_year"].isna() & got["o_orderpriority"].isna()]
    assert len(total) == 1
    assert int(total["n_orders"].iloc[0]) == int(finest["n_orders"].sum())
    assert abs(float(total["revenue"].iloc[0]) - finest["revenue"].sum()) < 1.0
    # all four grouping sets present
    assert (got["order_year"].isna() & got["o_orderpriority"].notna()).any()
    assert (got["order_year"].notna() & got["o_orderpriority"].isna()).any()


def test_bpe_pair_counts_hand_built(tmp_path):
    from chunksilo_ray.ops.textstats import bpe_pair_counts

    texts = ["aab aab", "aab", "xy"]
    # in-token pairs: 'aa' x3, 'ab' x3, 'xy' x1 (space-adjacent masked)
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    d = tmp_path / "bpedir"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    got = _as_df(bpe_pair_counts(str(d), k=10)).set_index("pair")["n"]
    assert got.to_dict() == {"aa": 3, "ab": 3, "xy": 1}


def test_mad_outlier_fence_constructed():
    """A distribution with one gross outlier: MAD stays small, the fence
    flags exactly the outlier."""
    v = np.array([10.0] * 9 + [1000.0])
    med = float(np.median(v))
    dev = np.abs(v - med)
    mad = float(np.median(dev))
    flagged = dev > 3 * 1.4826 * mad
    # degenerate mad==0 here (9 identical values) -> everything non-median
    # flagged; the operator inherits this exact semantics from the formula
    assert flagged.sum() == 1
