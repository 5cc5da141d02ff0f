"""Constructed-positive gates for the corpus-curation operators.

The driver's sf testdata gives these queries weak signal (single-line docs,
no planted contamination), so — like the round-2 embedding_near_dups gate —
each test builds a corpus where the interesting branch MUST fire, then
checks the Ray op against the SHIPPED oracle SQL from __ray_entry__
running on the same constructed corpus (full parity, not a re-derivation).
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "/root/repo")


def _write_docs(tmp_path, rows):
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    return str(tmp_path)


def _oracle(sf_dir: str, name: str) -> pd.DataFrame:
    import __ray_entry__ as E

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    return con.execute(E.oracle_sql()[name]).fetchdf()


def _compare(ds, sf_dir: str, name: str):
    got = ds.to_pandas()
    exp = _oracle(sf_dir, name)
    cols = sorted(exp.columns)
    assert sorted(got.columns) == cols
    g = got[cols].sort_values(cols).reset_index(drop=True)
    e = exp[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, e, rtol=1e-9, check_dtype=False)
    return g


def test_decontaminate_drops_planted_contamination(ray_session, tmp_path):
    from chunksilo_ray.ops import curation

    probe = "the quick brown fox jumps over the lazy benchmark sentence"
    rows = [
        # doc 7 is the held-out probe source (doc_id % 100 == 7)
        (7, probe + " with trailing context", "en", "src0"),
        # doc 12 CONTAINS the probe's first 40 chars -> must be dropped
        (12, "prefix words then " + probe[:40] + " suffix", "en", "src1"),
        # clean docs -> kept
        (13, "totally unrelated text about data pipelines", "en", "src2"),
        (25, "another clean document body with words", "en", "src3"),
        # doc 107 also held out (not part of the training output at all)
        (107, "second held out probe document text here", "en", "src0"),
    ]
    sf = _write_docs(tmp_path, rows)
    got = _compare(curation.decontaminate_docs(sf), sf, "decontaminate_docs")
    ids = set(got["doc_id"])
    assert 12 not in ids  # planted contamination caught
    assert ids == {13, 25}  # held-out docs excluded, clean docs kept


def test_line_repetition_flags_duplicate_lines(ray_session, tmp_path):
    from chunksilo_ray.ops import curation

    spam = "\n".join(["buy now"] * 7 + ["unique closer"])  # 8 lines, 2 distinct
    clean = "line one\nline two\nline three"
    rows = [
        (1, spam, "en", "src0"),
        (2, clean, "en", "src1"),
        (3, "single line no newline", "en", "src2"),
    ]
    sf = _write_docs(tmp_path, rows)
    got = _compare(curation.doc_line_repetition(sf), sf, "doc_line_repetition")
    by_id = got.set_index("doc_id")
    assert by_id.loc[1, "n_lines"] == 8 and by_id.loc[1, "n_distinct_lines"] == 2
    assert by_id.loc[1, "dup_line_frac"] == 0.75 and not by_id.loc[1, "keep"]
    assert by_id.loc[2, "keep"] and by_id.loc[3, "keep"]


def test_top_bigrams_counts_and_tiebreak(ray_session, tmp_path):
    from chunksilo_ray.ops import curation

    rows = [
        (1, "alpha beta alpha beta gamma", "en", "src0"),  # alpha beta x2
        (2, "Alpha, beta! delta--epsilon", "en", "src1"),  # punctuation folds
        (3, "beta gamma", "en", "src2"),
    ]
    sf = _write_docs(tmp_path, rows)
    got = _compare(curation.top_bigrams(sf), sf, "top_bigrams")
    top = got.sort_values(["n", "bigram"], ascending=[False, True]).reset_index(drop=True)
    counts = dict(zip(top["bigram"], top["n"]))
    assert counts["alpha beta"] == 3  # 2 in doc1 + 1 folded in doc2
    assert counts["beta gamma"] == 2
    assert counts["beta alpha"] == 1 and counts["delta epsilon"] == 1
    # bigrams never cross documents
    assert "gamma alpha" not in counts and "epsilon beta" not in counts


def test_mix_sources_rates_and_determinism(ray_session, tmp_path):
    import hashlib

    from chunksilo_ray.ops import curation

    # enough rows per stratum that both sides of every gate fire
    rows = []
    did = 0
    for s in ("src0", "src1", "src3"):
        for i in range(40):
            rows.append((did, f"document body {s} variant {i} padding words", "en", s))
            did += 1
    sf = _write_docs(tmp_path, rows)
    got = _compare(curation.mix_sources(sf), sf, "mix_sources")
    by_src = got.groupby("source").size()
    assert by_src.get("src0", 0) == 40  # rate 1.0 keeps everything
    assert 0 < by_src.get("src1", 0) < 40  # rate 1/2 gate fires both ways
    assert 0 < by_src.get("src3", 0) < 40  # rate 1/4 gate fires both ways
    # determinism: the gate is the md5 prefix, reproducible from the text
    kept1 = {
        r[0]
        for r in rows
        if r[3] == "src1"
        and hashlib.md5(r[1].encode()).hexdigest()[:4] < "8000"
    }
    assert set(got[got["source"] == "src1"]["doc_id"]) == kept1


def test_redact_pii_positive(ray_session, tmp_path):
    """Planted emails and phone numbers must be counted and masked; parity
    with the shipped RE2 SQL on the same corpus (corpus testdata carries no
    PII, so this is the op's only positive-branch gate)."""
    from chunksilo_ray.ops import curation

    rows = [
        (1, "contact alice.smith+ml@example.co.uk or bob@x.io today", "en", "src0"),
        (2, "call 555-123-4567 or 800.555.0199 for support", "en", "src1"),
        (3, "mixed: eve@corp.net and 212-555-7788 in one line", "en", "src2"),
        (4, "no pii here, just words and numbers like 12345", "en", "src3"),
        (5, "not-an-email @ example .com and 12-34-56 stay", "en", "src0"),
    ]
    sf = _write_docs(tmp_path, rows)
    got = _compare(curation.redact_pii(sf), sf, "redact_pii")
    by_id = got.set_index("doc_id")
    assert by_id.loc[1, "n_emails"] == 2 and by_id.loc[1, "n_phones"] == 0
    assert "[EMAIL]" in by_id.loc[1, "redacted"] and "alice" not in by_id.loc[1, "redacted"]
    assert by_id.loc[2, "n_phones"] == 2 and "[PHONE]" in by_id.loc[2, "redacted"]
    assert by_id.loc[3, "n_emails"] == 1 and by_id.loc[3, "n_phones"] == 1
    assert bool(by_id.loc[4, "pii_free"]) and by_id.loc[4, "redacted"] == rows[3][1]
    assert bool(by_id.loc[5, "pii_free"])  # malformed lookalikes untouched


def test_bigram_repetition_flags_template_spam(ray_session, tmp_path):
    from chunksilo_ray.ops import curation

    spam = " ".join(["buy now"] * 10)  # "now buy" x9, "buy now" x10 of 19
    clean = "one two three four five six seven eight nine ten"
    rows = [
        (1, spam, "en", "src0"),
        (2, clean, "en", "src1"),
        (3, "word", "en", "src2"),  # single word: zero bigrams
        (4, "", "en", "src3"),  # empty text
    ]
    sf = _write_docs(tmp_path, rows)
    got = _compare(curation.doc_bigram_repetition(sf), sf, "doc_bigram_repetition")
    by_id = got.set_index("doc_id")
    assert by_id.loc[1, "n_bigrams"] == 19 and by_id.loc[1, "top_n"] == 10
    assert not by_id.loc[1, "keep"]  # 10/19 >> 0.125
    assert by_id.loc[2, "top_n"] == 1 and by_id.loc[2, "keep"]
    assert by_id.loc[3, "n_bigrams"] == 0 and by_id.loc[3, "keep"]
    assert by_id.loc[4, "n_bigrams"] == 0 and by_id.loc[4, "keep"]


def test_postings_and_term_stats_match_shipped_oracle(ray_session, tmp_path):
    """Index-builder parity on a corpus with the tokenizer edge cases:
    punctuation folding, case folding, repeated terms, and an empty doc."""
    from chunksilo_ray.ops import text_search

    rows = [
        (1, "Data DATA data; pipelines!", "en", "src0"),  # tf(data)=3
        (2, "pipelines process data", "en", "src1"),
        (3, "", "en", "src2"),  # empty: contributes no postings
        (4, "42 widgets, 42 answers", "en", "src3"),  # digit terms
    ]
    sf = _write_docs(tmp_path, rows)
    got_p = _compare(text_search.build_postings(sf), sf, "build_postings")
    tf = {(r.term, r.doc_id): r.tf for r in got_p.itertuples()}
    assert tf[("data", 1)] == 3 and tf[("42", 4)] == 2
    assert not any(d == 3 for (_, d) in tf)  # empty doc absent

    got_s = _compare(text_search.term_stats(sf), sf, "term_stats")
    by_term = got_s.set_index("term")
    assert by_term.loc["data", "df"] == 2 and by_term.loc["data", "cf"] == 4
    assert by_term.loc["pipelines", "df"] == 2
    # idf is monotone decreasing in df
    assert by_term.loc["process", "idf"] > by_term.loc["data", "idf"]


def test_knn_join_matches_shipped_oracle(ray_session):
    """Batch kNN join parity on the sf0.001 embeddings: same rows, same
    cosines, same ranks as the shipped DuckDB SQL (self-matches excluded)."""
    import __ray_entry__ as E
    from chunksilo_ray.ops import similarity

    sf = "/root/testdata/sf0.001"
    got = similarity.knn_join(sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')"
    )
    exp = con.execute(E.oracle_sql()["knn_join"]).fetchdf()
    cols = sorted(exp.columns)
    assert sorted(got.columns) == cols
    g = got[cols].sort_values(cols).reset_index(drop=True)
    e = exp[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, e, rtol=1e-9, check_dtype=False)
    assert set(g["query_id"]) == set(range(8))
    assert (g.groupby("query_id").size() == 10).all()
    assert not (g["query_id"] == g["vec_id"]).any()  # self excluded


def test_bloom_semi_join_matches_shipped_oracle(ray_session):
    """Bloom pruning must not change results: exact parity with the shipped
    semi-join SQL on the sf0.001 driver tables (false positives removed by
    the verify step, false negatives impossible by Bloom construction)."""
    import __ray_entry__ as E
    from chunksilo_ray.ops import sketches

    sf = "/root/testdata/sf0.001"
    got = sketches.bloom_semi_join_events(sf).to_pandas()
    con = duckdb.connect()
    for t in ("events", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    exp = con.execute(E.oracle_sql()["bloom_semi_join_events"]).fetchdf()
    cols = sorted(exp.columns)
    assert sorted(got.columns) == cols
    g = got[cols].sort_values(cols).reset_index(drop=True)
    e = exp[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, e, rtol=1e-9, check_dtype=False)
    assert len(g) > 0  # the join key domains overlap by construction


def test_funnel_stages_ordering_semantics(ray_session, tmp_path):
    """Constructed funnel: a click BEFORE the first view must not count as
    stage 2 — parity with the shipped SQL on a corpus where ordering is the
    deciding factor."""
    import __ray_entry__ as E
    from chunksilo_ray.ops import window

    ts = pd.Timestamp("2024-01-01")
    rows = [
        # user 1: full ordered funnel
        (1, 1, ts, "view"), (2, 1, ts + pd.Timedelta("1h"), "click"),
        (3, 1, ts + pd.Timedelta("2h"), "purchase"),
        # user 2: click BEFORE view -> stops at stage 1
        (4, 2, ts, "click"), (5, 2, ts + pd.Timedelta("1h"), "view"),
        # user 3: view+click, purchase before click -> stops at stage 2
        (6, 3, ts, "view"), (7, 3, ts + pd.Timedelta("30m"), "purchase"),
        (8, 3, ts + pd.Timedelta("1h"), "click"),
        # user 4: no view at all -> not in the funnel
        (9, 4, ts, "purchase"),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    got = window.funnel_stages(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    exp = con.execute(E.oracle_sql()["funnel_stages"]).fetchdf()
    g = got.sort_values("stage").reset_index(drop=True)
    e = exp.sort_values("stage").reset_index(drop=True)
    pd.testing.assert_frame_equal(g, e, check_dtype=False)
    assert list(g["n_users"]) == [3, 2, 1]  # users {1,2,3} / {1,3} / {1}
