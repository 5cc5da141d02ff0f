"""Round-4 batch-29 gate: DuckDB value-parity at sf0.001 for the
language-ID confusion matrix, plus mass invariants."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")

SF = "/root/testdata/sf0.001"


def _as_df(res) -> pd.DataFrame:
    return res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return con.execute(sql).fetchdf()


def test_batch29_duckdb_parity():
    import __ray_entry__ as E

    got = _as_df(E.queries()["lang_confusion_matrix"](SF))
    exp = _oracle(E.oracle_sql()["lang_confusion_matrix"])
    assert len(got) > 0
    cols = sorted(got.columns)
    a = got[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    b = exp[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_confusion_mass_and_consistency():
    """Matrix mass = corpus size, and the per-pred_lang marginals agree
    with the standalone detect_language op."""
    import __ray_entry__ as E

    got = _as_df(E.queries()["lang_confusion_matrix"](SF))
    n_docs = _oracle("SELECT COUNT(*) AS n FROM documents")["n"].iloc[0]
    assert int(got["n_docs"].sum()) == int(n_docs)
    det = _as_df(E.queries()["detect_language"](SF))
    marg = det.groupby("pred_lang").size()
    ours = got.groupby("pred_lang")["n_docs"].sum()
    assert ours.to_dict() == marg.to_dict()


def test_self_loop_audit_parity_and_bounds():
    import __ray_entry__ as E

    KG_OUT = "/tmp/chunksilo_ray_kg_out/sf0.001"
    got = _as_df(E.queries()["kg_self_loop_audit"](SF))
    sql = E.oracle_sql()["kg_self_loop_audit"].replace(
        "/tmp/chunksilo_ray_kg_out/sf0.01", KG_OUT
    )
    exp = duckdb.connect().execute(sql).fetchdf()
    cols = sorted(got.columns)
    a = got[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    b = exp[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert (got["n_self_loops"] <= got["n_triples"]).all()
    assert (got["w_self"] <= got["w_total"]).all()
