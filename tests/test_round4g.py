"""Round-4 batch-16 gates: DuckDB value-parity at sf0.001 for the KG
query additions (2-hop path census, per-predicate reciprocity, conjunctive
star query) and the role-trigram motif census, plus constructed-graph
semantics checks."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")

SF = "/root/testdata/sf0.001"
KG_OUT = "/tmp/chunksilo_ray_kg_out/sf0.001"
TP = "/tmp/chunksilo_ray_testdata/sf0.001-seed42/transcripts.parquet"


def _as_df(res) -> pd.DataFrame:
    return res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)


def _assert_value_match(ray_df: pd.DataFrame, ora_df: pd.DataFrame):
    assert sorted(ray_df.columns) == sorted(ora_df.columns)
    cols = sorted(ray_df.columns)
    a = ray_df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    b = ora_df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, rtol=1e-9, atol=1e-9)


def _sql01_to_sf0001(sql: str) -> str:
    return sql.replace("/tmp/chunksilo_ray_kg_out/sf0.01", KG_OUT).replace(
        "/tmp/chunksilo_ray_testdata/sf0.01-seed42/transcripts.parquet", TP
    )


@pytest.mark.parametrize(
    "name", ["kg_path_census", "kg_reciprocity", "kg_star_query", "role_trigrams"]
)
def test_batch16_duckdb_parity(name):
    import __ray_entry__ as E

    got = _as_df(E.queries()[name](SF))
    exp = duckdb.connect().execute(_sql01_to_sf0001(E.oracle_sql()[name])).fetchdf()
    assert len(got) > 0
    _assert_value_match(got, exp)


# ---------------------------------------------------------------- semantics


def _tiny_ea(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "subj": pa.array([r[0] for r in rows], pa.string()),
                "pred": pa.array([r[1] for r in rows], pa.string()),
                "obj": pa.array([r[2] for r in rows], pa.string()),
                "weight": pa.array([1] * len(rows), pa.int64()),
            }
        )
    )


def test_path_census_constructed():
    """a-p->b, b-q->c, b-q->d, c-p->a : chains through b = p>q x2, through
    c = q>p x1; self-join semantics include the a-c-a cycle."""
    from chunksilo_ray.ops.graph import kg_path_census

    ea = _tiny_ea(
        [("a", "p", "b"), ("b", "q", "c"), ("b", "q", "d"), ("c", "p", "a")]
    )
    got = _as_df(kg_path_census(ea)).set_index(["pred1", "pred2"])["n_paths"]
    # through b: (a-p->b)(b-q->c), (a-p->b)(b-q->d); through c: (b-q->c)(c-p->a)
    # through a: (c-p->a)(a-p->b)
    assert got.to_dict() == {("p", "q"): 2, ("q", "p"): 1, ("p", "p"): 1}


def test_reciprocity_constructed():
    """One reciprocal pair + one one-way + a self-loop (excluded)."""
    from chunksilo_ray.ops.graph import kg_reciprocity

    ea = _tiny_ea(
        [
            ("a", "p", "b"),
            ("b", "p", "a"),
            ("a", "p", "c"),
            ("d", "p", "d"),  # self-loop: dropped
            ("x", "q", "y"),
        ]
    )
    got = _as_df(kg_reciprocity(ea)).set_index("pred")
    assert got.loc["p", "n_pairs"] == 3 and got.loc["p", "n_recip"] == 2
    assert abs(got.loc["p", "recip_rate"] - round(2 / 3, 6)) < 1e-12
    assert got.loc["q", "n_pairs"] == 1 and got.loc["q", "n_recip"] == 0


def test_star_query_constructed():
    """Only subjects holding ALL requested predicates survive; n_objs counts
    every matched triple."""
    from chunksilo_ray.ops.graph import kg_star_query

    ea = _tiny_ea(
        [
            ("s1", "p", "x"),
            ("s1", "q", "y"),
            ("s1", "q", "z"),
            ("s2", "p", "x"),  # missing q
            ("s3", "q", "y"),  # missing p
        ]
    )
    got = _as_df(kg_star_query(ea, preds=("p", "q")))
    assert got["subj"].tolist() == ["s1"] and int(got["n_objs"].iloc[0]) == 3


def test_role_trigrams_bounded_vocab():
    import __ray_entry__ as E

    got = _as_df(E.queries()["role_trigrams"](SF))
    roles = {"user", "assistant", "tool"}
    for c in ("r1", "r2", "r3"):
        assert set(got[c]) <= roles
    assert (got["n_trigrams"] > 0).all()
