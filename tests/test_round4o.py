"""Round-4 batch-24 gates: DuckDB value-parity at sf0.001 for evidence
retrieval (top triples joined to first-witness turn text) and binary media
content-hash dedup, plus semantics checks."""

from __future__ import annotations

import duckdb
import pandas as pd
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


def _oracle(sql: str) -> pd.DataFrame:
    sql = sql.replace("/tmp/chunksilo_ray_kg_out/sf0.01", KG_OUT).replace(
        "/tmp/chunksilo_ray_testdata/sf0.01-seed42/transcripts.parquet", TP
    )
    return duckdb.connect().execute(sql).fetchdf()


@pytest.mark.parametrize("name", ["kg_evidence_text", "media_dup_groups"])
def test_batch24_duckdb_parity(name):
    import __ray_entry__ as E

    got = _as_df(E.queries()[name](SF))
    exp = _oracle(E.oracle_sql()[name])
    assert len(got) > 0
    _assert_value_match(got, exp)


def test_evidence_text_mentions_entity():
    """Spot-check grounding: every evidence turn is the actual text of its
    first-witness turn (re-fetched independently here)."""
    import __ray_entry__ as E

    got = _as_df(E.queries()["kg_evidence_text"](SF)).head(10)
    con = duckdb.connect()
    for _, r in got.iterrows():
        conv, turn = r["first_witness"].rsplit(":", 1)
        txt = con.execute(
            f"SELECT text FROM read_parquet('{TP}') "
            "WHERE conv_id = ? AND turn_idx = ?",
            [conv, int(turn)],
        ).fetchone()[0]
        assert txt == r["evidence"]


def test_media_dups_exactly_injected():
    """The fixture injects exactly 8 duplicated payloads; every reported
    group has 2 assets and its canonical id is the ORIGINAL (m-*)."""
    import __ray_entry__ as E

    got = _as_df(E.queries()["media_dup_groups"](SF))
    assert len(got) == 8
    assert (got["n_assets"] == 2).all()
    assert got["min_media_id"].str.startswith("zdup-").sum() == 0
