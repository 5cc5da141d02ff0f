"""Round-4 batch-22 gates: DuckDB value-parity at sf0.001 for conversation
entity-richness ranking, per-triple confidence and the language x source
crosstab, plus invariants."""

from __future__ import annotations

import duckdb
import numpy as np
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
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    sql = sql.replace("/tmp/chunksilo_ray_kg_out/sf0.01", KG_OUT)
    return con.execute(sql).fetchdf()


@pytest.mark.parametrize(
    "name", ["conv_entity_richness", "kg_edge_confidence", "lang_source_crosstab"]
)
def test_batch22_duckdb_parity(name):
    import __ray_entry__ as E

    got = _as_df(E.queries()[name](SF))
    exp = _oracle(E.oracle_sql()[name])
    assert len(got) > 0
    _assert_value_match(got, exp)


def test_confidence_groups_sum_to_one():
    """Within every (subj, pred) group the confidences sum to ~1 and each
    triple's confidence is weight-proportional."""
    import __ray_entry__ as E

    got = _as_df(E.queries()["kg_edge_confidence"](SF))
    s = got.groupby(["subj", "pred"])["confidence"].sum()
    # ROUND(6) per row: |group| * 5e-7 worst-case drift
    sizes = got.groupby(["subj", "pred"]).size()
    assert (np.abs(s - 1.0) <= sizes * 5e-7 + 1e-9).all()
    assert (got["confidence"] > 0).all() and (got["confidence"] <= 1.0).all()


def test_crosstab_total_matches_corpus():
    import __ray_entry__ as E

    got = _as_df(E.queries()["lang_source_crosstab"](SF))
    n_docs = _oracle("SELECT COUNT(*) AS n FROM documents")["n"].iloc[0]
    assert int(got["n_total"].sum()) == int(n_docs)
    src_cols = [c for c in got.columns if c.startswith("n_src")]
    assert (got[src_cols].sum(axis=1) == got["n_total"]).all()


def test_richness_rank_is_deterministic():
    import __ray_entry__ as E

    got = _as_df(E.queries()["conv_entity_richness"](SF))
    n = got["n_entities"].to_numpy()
    assert (n[:-1] >= n[1:]).all()
    # within equal counts, conv_id ascending
    for _, g in got.groupby("n_entities"):
        assert list(g["conv_id"]) == sorted(g["conv_id"])
