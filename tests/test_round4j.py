"""Round-4 batch-19 gates: DuckDB value-parity at sf0.001 for weekly cohort
retention, Flesch readability cards and the predicate-confusion card, plus
constructed semantics checks."""

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
    for t in ("events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sql = sql.replace("/tmp/chunksilo_ray_kg_out/sf0.01", KG_OUT)
    return con.execute(sql).fetchdf()


@pytest.mark.parametrize(
    "name", ["cohort_retention", "readability_scores", "kg_pred_confusion"]
)
def test_batch19_duckdb_parity(name):
    import __ray_entry__ as E

    got = _as_df(E.queries()[name](SF))
    exp = _oracle(E.oracle_sql()[name])
    assert len(got) > 0
    _assert_value_match(got, exp)


# ---------------------------------------------------------------- semantics


def test_cohort_offset_zero_is_cohort_size():
    """Every user is active in their own first week, so the offset-0 row of
    each cohort equals the cohort's size (new users that week)."""
    import __ray_entry__ as E

    got = _as_df(E.queries()["cohort_retention"](SF))
    zero = got[got["offset_weeks"] == 0].set_index("cohort_week")["n_users"]
    sizes = _oracle(
        """WITH a AS (SELECT user_id,
                             MIN(CAST(epoch_us(ts) // 604800000000 AS BIGINT)) AS w
                      FROM events GROUP BY user_id)
           SELECT w AS cohort_week, COUNT(*) AS n FROM a GROUP BY w"""
    ).set_index("cohort_week")["n"]
    for cw, n in sizes.items():
        assert int(zero.loc[cw]) == int(n)
    # retention never exceeds cohort size
    for _, r in got.iterrows():
        assert r["n_users"] <= int(sizes.loc[r["cohort_week"]])


def test_readability_monotone_sanity():
    """More syllables per word -> lower flesch, same word/sentence counts."""
    import ray.data as rd
    from chunksilo_ray.ops.textstats import readability_scores

    # go through the public op path by building a tiny docs table on disk
    import pyarrow.parquet as pq
    import tempfile, os

    d = tempfile.mkdtemp()
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["cat sat mat.", "onomatopoeia universe."], pa.string()),
        }
    )
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    got = _as_df(readability_scores(d)).set_index("doc_id")
    assert got.loc[1, "n_words"] == 3 and got.loc[1, "n_sentences"] == 1
    assert got.loc[1, "flesch"] > got.loc[2, "flesch"]


def test_pred_confusion_constructed():
    import ray.data as rd
    from chunksilo_ray.ops.graph import kg_pred_confusion

    ea = rd.from_arrow(
        pa.table(
            {
                "subj": pa.array(["a", "a", "a", "b"], pa.string()),
                "pred": pa.array(["p", "q", "r", "p"], pa.string()),
                "obj": pa.array(["x", "x", "x", "y"], pa.string()),
                "weight": pa.array([1, 1, 1, 1], pa.int64()),
            }
        )
    )
    got = (
        _as_df(kg_pred_confusion(ea))
        .set_index(["pred1", "pred2"])["n_pairs"]
        .to_dict()
    )
    assert got == {("p", "q"): 1, ("p", "r"): 1, ("q", "r"): 1}
