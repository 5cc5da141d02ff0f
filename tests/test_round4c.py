"""Round-4 batch-7 gates: DuckDB value-parity (at sf0.001, via the
parameterized oracle generators) plus constructed-positive semantics checks
for the KG analytics additions (HITS hubs/authorities, deterministic
DeepWalk walks, component-size fragmentation QA) and the transcripts
curation additions (flagged-turn fraction, first-user-turn prompt dedup)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from chunksilo_ray import oracles as O

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


def _edges(pairs):
    return pa.table(
        {
            "subj": pa.array([p[0] for p in pairs], pa.string()),
            "pred": pa.array(["rel"] * len(pairs), pa.string()),
            "obj": pa.array([p[1] for p in pairs], pa.string()),
            "weight": pa.array([1] * len(pairs), pa.int64()),
        }
    )


# ---------------------------------------------------------------- parity


def test_kg_hits_matches_duckdb():
    import __ray_entry__ as E

    got = _as_df(E.queries()["kg_hits"](SF).to_pandas())
    exp = duckdb.connect().execute(O._kg_hits_sql(KG_OUT)).fetchdf()
    assert len(got) > 100
    # L1 normalization: both score columns sum to ~1
    assert abs(got["hub"].sum() - 1.0) < 1e-3
    assert abs(got["authority"].sum() - 1.0) < 1e-3
    _assert_value_match(got, exp)


def test_kg_random_walks_matches_duckdb():
    import __ray_entry__ as E

    got = _as_df(E.queries()["kg_random_walks"](SF).to_pandas())
    exp = duckdb.connect().execute(O._kg_walks_sql(KG_OUT)).fetchdf()
    # 8 seeds x 2 walks x (walk_len + 1 = 5) steps
    assert len(got) == 8 * 2 * 5
    _assert_value_match(got, exp)


def test_kg_component_sizes_matches_duckdb():
    import __ray_entry__ as E

    got = _as_df(E.queries()["kg_component_sizes"](SF).to_pandas())
    exp = duckdb.connect().execute(O._kg_csize_sql(KG_OUT)).fetchdf()
    assert len(got) > 0
    _assert_value_match(got, exp)


def test_error_turn_fraction_matches_duckdb():
    import __ray_entry__ as E

    got = _as_df(E.queries()["error_turn_fraction"](SF).to_pandas())
    exp = duckdb.connect().execute(O._flagged_turns_sql(TP)).fetchdf()
    assert len(got) > 0
    # the default pattern actually fires on this corpus (templates carry
    # "failing with" / "error in the") — the signal is non-degenerate
    assert got["n_flagged"].sum() > 0
    _assert_value_match(got, exp)


def test_prompt_prefix_dedup_matches_duckdb():
    import __ray_entry__ as E

    got = _as_df(E.queries()["prompt_prefix_dedup"](SF).to_pandas())
    exp = duckdb.connect().execute(O._prompt_dedup_sql(TP)).fetchdf()
    assert len(got) > 0
    _assert_value_match(got, exp)


# ----------------------------------------------------- constructed positives


def test_kg_hits_constructed_matches_numpy_reference():
    """Tiny directed graph vs a literal numpy HITS: 'a' points at both
    'b' and 'c' (best hub), 'c' is pointed at by a and b (best authority)."""
    import ray.data as rd

    from chunksilo_ray.ops.graph import kg_hits

    pairs = [("a", "b"), ("a", "c"), ("b", "c")]
    out = {
        r["entity"]: (r["hub"], r["authority"])
        for r in kg_hits(rd.from_arrow(_edges(pairs)), n_iter=5).to_pylist()
    }
    nodes = ["a", "b", "c"]
    idx = {n: i for i, n in enumerate(nodes)}
    h = np.ones(3)
    a = np.zeros(3)
    for _ in range(5):
        a = np.zeros(3)
        for s, d in pairs:
            a[idx[d]] += h[idx[s]]
        a /= a.sum()
        h = np.zeros(3)
        for s, d in pairs:
            h[idx[s]] += a[idx[d]]
        h /= h.sum()
    for n in nodes:
        assert out[n] == (round(float(h[idx[n]]), 6), round(float(a[idx[n]]), 6))
    assert max(out, key=lambda n: out[n][0]) == "a"  # best hub
    assert max(out, key=lambda n: out[n][1]) == "c"  # best authority


def test_kg_random_walks_follow_edges_and_are_deterministic():
    """Every consecutive (step t-1, step t) pair must be an edge of the
    undirected graph; two runs are byte-identical; step 0 is the seed."""
    import ray.data as rd

    from chunksilo_ray.ops.graph import kg_random_walks

    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("b", "d"), ("a", "e")]
    und = set()
    for s, o in pairs:
        und.add((s, o))
        und.add((o, s))

    def run():
        return (
            kg_random_walks(
                rd.from_arrow(_edges(pairs)), n_seeds=3, walks_per_seed=2, walk_len=4
            )
            .to_pandas()
            .sort_values(["seed", "walk_id", "step"])
            .reset_index(drop=True)
        )

    w1, w2 = run(), run()
    pd.testing.assert_frame_equal(w1, w2)
    assert len(w1) == 3 * 2 * 5
    for (_, wdf) in w1.groupby(["seed", "walk_id"]):
        ents = wdf.sort_values("step")["entity"].tolist()
        assert ents[0] == wdf["seed"].iloc[0]
        for prev, cur in zip(ents, ents[1:]):
            assert (prev, cur) in und, (prev, cur)
    # seeds are the 3 highest-degree nodes: b (deg 3), a (2), c (2), d (2)
    # ties by entity asc -> {b, a, c}
    assert set(w1["seed"]) == {"a", "b", "c"}


def test_kg_component_sizes_constructed():
    """Two components (a-b-c triangle-ish chain, x-y pair): histogram rows
    (3, 1) and (2, 1)."""
    import ray.data as rd

    from chunksilo_ray.ops.graph import kg_component_sizes

    out = {
        r["size"]: r["n_components"]
        for r in kg_component_sizes(
            rd.from_arrow(_edges([("a", "b"), ("b", "c"), ("x", "y")]))
        ).take_all()
    }
    assert out == {3: 1, 2: 1}


def test_flagged_turn_fraction_constructed(tmp_path):
    """Hand-built conversations: c1 has 1 of 2 turns flagged, c2 has none."""
    import pyarrow.parquet as pq

    from chunksilo_ray.ops.window import flagged_turn_fraction

    t = pa.table(
        {
            "conv_id": pa.array(["c1", "c1", "c2"], pa.string()),
            "text": pa.array(
                ["the build is failing badly", "all good now", "nothing to see"],
                pa.string(),
            ),
        }
    )
    p = str(tmp_path / "t.parquet")
    pq.write_table(t, p)
    out = {
        r["conv_id"]: (r["n_turns"], r["n_flagged"], r["flag_fraction"])
        for r in flagged_turn_fraction(p).take_all()
    }
    assert out == {"c1": (2, 1, 0.5), "c2": (1, 0, 0.0)}


def test_prompt_prefix_dedup_constructed(tmp_path):
    """c1 and c3 share the same FIRST user turn (c1's later user turn and
    c3's differing second turn must not matter); c2 differs; a conversation
    with no user turns is dropped by both contract and guard."""
    import pyarrow.parquet as pq

    from chunksilo_ray.ops.window import prompt_prefix_dedup

    rows = [
        ("c1", 0, "user", "same question"),
        ("c1", 1, "assistant", "answer one"),
        ("c1", 2, "user", "different follow-up"),
        ("c2", 0, "user", "other question"),
        ("c2", 1, "assistant", "answer two"),
        ("c3", 0, "user", "same question"),
        ("c3", 1, "assistant", "answer three"),
        ("c4", 0, "assistant", "no user turn here"),
    ]
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    p = str(tmp_path / "t.parquet")
    pq.write_table(t, p)
    out = {
        r["conv_id"]: (r["rep_conv_id"], r["group_size"])
        for r in prompt_prefix_dedup(p).take_all()
    }
    assert out == {"c1": ("c1", 2), "c3": ("c1", 2), "c2": ("c2", 1)}
    assert "c4" not in out


# --------------------------------------------------- JSONL/CSV interchange


def test_jsonl_roundtrip_transcripts_matches_parquet_oracle():
    """Query answers from write_json -> read_json files; oracle answers
    from the ORIGINAL parquet — a match proves the JSONL roundtrip is
    lossless (row count, string bytes incl. JSON escaping, ints)."""
    import __ray_entry__ as E

    got = _as_df(E.queries()["jsonl_roundtrip_transcripts"](SF).to_pandas())
    exp = duckdb.connect().execute(f"""
        SELECT role, CAST(count(*) AS BIGINT) AS n_turns,
               CAST(SUM(length(text)) AS BIGINT) AS total_chars,
               CAST(MAX(turn_idx) AS BIGINT) AS max_turn_idx
        FROM read_parquet('{TP}') GROUP BY role""").fetchdf()
    assert set(got["role"]) == {"user", "assistant", "tool"}
    _assert_value_match(got, exp)


def test_csv_roundtrip_events_matches_parquet_oracle():
    import __ray_entry__ as E

    got = _as_df(E.queries()["csv_roundtrip_events"](SF).to_pandas())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    exp = con.execute(E.oracle_sql()["csv_roundtrip_events"]).fetchdf()
    assert len(got) == 5
    _assert_value_match(got, exp)


def test_export_once_rewrites_partial_dir(tmp_path):
    """A crashed export (dir exists, no _SUCCESS marker) must be rewritten,
    not trusted; a completed one must be reused untouched."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from chunksilo_ray.sources import interchange

    t = pa.table({"a": pa.array([1, 2, 3], pa.int64())})
    src_pq = str(tmp_path / "src.parquet")
    pq.write_table(t, src_pq)
    out = str(tmp_path / "exp")

    # simulate a crash: partial dir with garbage, no marker
    os.makedirs(out)
    with open(os.path.join(out, "garbage.json"), "w") as f:
        f.write("{broken")
    interchange._export_once(rd.read_parquet(src_pq), out, "json")
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    got = rd.read_json(out, file_extensions=["json"]).to_pandas()
    assert sorted(got["a"].tolist()) == [1, 2, 3]

    # completed export is reused: mtimes unchanged after a second call
    files = {
        f: os.path.getmtime(os.path.join(out, f)) for f in os.listdir(out)
    }
    interchange._export_once(rd.read_parquet(src_pq), out, "json")
    assert files == {
        f: os.path.getmtime(os.path.join(out, f)) for f in os.listdir(out)
    }


# ------------------------------------------------- label propagation


def test_kg_label_prop_matches_duckdb():
    import __ray_entry__ as E

    got = _as_df(E.queries()["kg_label_prop"](SF).to_pandas())
    exp = duckdb.connect().execute(O._kg_label_prop_sql(KG_OUT)).fetchdf()
    assert len(got) > 0
    _assert_value_match(got, exp)


def test_kg_label_prop_constructed_communities():
    import ray.data as rd

    from chunksilo_ray.ops.graph import kg_label_prop

    # triangle a-b-c with pendant d: one community, labeled by the
    # lexicographically smallest member after 3 rounds
    one = kg_label_prop(
        rd.from_arrow(_edges([("a", "b"), ("b", "c"), ("a", "c"), ("a", "d")])),
        n_iter=3,
    ).to_pydict()
    assert one["community"] == ["a", "a", "a", "a"]

    # two triangles joined by one bridge: two communities
    two = kg_label_prop(
        rd.from_arrow(
            _edges(
                [
                    ("a", "b"), ("b", "c"), ("a", "c"),
                    ("x", "y"), ("y", "z"), ("x", "z"),
                    ("c", "x"),
                ]
            )
        ),
        n_iter=3,
    ).to_pydict()
    comm = dict(zip(two["entity"], two["community"]))
    assert comm["a"] == comm["b"] == comm["c"]
    assert comm["x"] == comm["y"] == comm["z"]
    assert comm["a"] != comm["x"]


# ------------------------------------------------- weighted sampling


def test_weighted_sample_per_lang_matches_duckdb():
    import __ray_entry__ as E

    got = _as_df(E.queries()["weighted_sample_per_lang"](SF).to_pandas())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    exp = con.execute(E.oracle_sql()["weighted_sample_per_lang"]).fetchdf()
    assert len(got) > 0
    _assert_value_match(got, exp)


def test_weighted_sample_prefers_longer_docs():
    """With equal digests impossible, the length weighting must make the
    kept set's mean n_chars exceed the corpus mean (longer docs draw
    smaller priorities)."""
    import __ray_entry__ as E
    import pyarrow.parquet as pq

    got = _as_df(E.queries()["weighted_sample_per_lang"](SF).to_pandas())
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "n_chars"]).to_pandas()
    kept = docs[docs.doc_id.isin(set(got.doc_id))]
    assert kept.n_chars.mean() > docs.n_chars.mean()


# ------------------------------------------------- round-4 batch 9


def _docs_con():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return con


_TR01 = "/tmp/chunksilo_ray_testdata/sf0.01-seed42/transcripts.parquet"
_KG01 = "/tmp/chunksilo_ray_kg_out/sf0.01"


def test_role_alternation_audit_matches_duckdb():
    import __ray_entry__ as E

    got = _as_df(E.queries()["role_alternation_audit"](SF).to_pandas())
    exp = duckdb.connect().execute(
        E.oracle_sql()["role_alternation_audit"].replace(_TR01, TP)
    ).fetchdf()
    assert len(got) > 0
    _assert_value_match(got, exp)


def test_context_window_pack_matches_duckdb():
    import __ray_entry__ as E

    got = _as_df(E.queries()["context_window_pack"](SF).to_pandas())
    exp = duckdb.connect().execute(
        E.oracle_sql()["context_window_pack"].replace(_TR01, TP)
    ).fetchdf()
    assert len(got) > 0
    _assert_value_match(got, exp)
    # semantics: at least the final turn always survives; a kept set larger
    # than one turn never exceeds the budget
    assert (got.n_kept >= 1).all()
    assert ((got.chars_kept <= 400) | (got.n_kept == 1)).all()
    # the corpus p90 conv length exceeds the budget, so SOME truncation
    # must have happened and SOME conversations must fit whole
    assert (got.n_kept < got.n_turns).any()
    assert (got.n_kept == got.n_turns).any()


def test_kg_adamic_adar_matches_duckdb():
    import __ray_entry__ as E

    got = _as_df(E.queries()["kg_adamic_adar"](SF))
    exp = duckdb.connect().execute(
        E.oracle_sql()["kg_adamic_adar"].replace(_KG01, KG_OUT)
    ).fetchdf()
    assert len(got) == 50
    _assert_value_match(got, exp)


def test_kg_adamic_adar_constructed():
    """a-b share middles m1, m2 (deg 3 each): AA(a,b) = 2/ln(3); the
    adjacent pair (m1, m2) shares {a, b} but must be excluded."""
    import math

    import ray.data as rd

    from chunksilo_ray.ops.graph import kg_adamic_adar

    ea = rd.from_arrow(
        _edges([("a", "m1"), ("b", "m1"), ("a", "m2"), ("b", "m2"), ("m1", "m2")])
    )
    t = kg_adamic_adar(ea, k=10).to_pandas()
    top = t.iloc[0]
    assert (top.node_a, top.node_b) == ("a", "b")
    assert top.common_n == 2
    assert abs(top.adamic_adar - round(2 / math.log(3), 6)) < 1e-9
    assert not (((t.node_a == "m1") & (t.node_b == "m2")).any())


# ------------------------------------------------- round-4 batch 10


def test_tool_attribution_matches_duckdb():
    import __ray_entry__ as E

    got = _as_df(E.queries()["tool_attribution"](SF).to_pandas())
    exp = duckdb.connect().execute(
        E.oracle_sql()["tool_attribution"].replace(_TR01, TP)
    ).fetchdf()
    assert len(got) > 0
    _assert_value_match(got, exp)


def test_tool_attribution_constructed_ffill():
    import pyarrow.parquet as pq

    from chunksilo_ray.ops.window import tool_attribution

    p = "/tmp/test_tool_attr.parquet"
    pq.write_table(
        pa.table(
            {
                "conv_id": pa.array(["c"] * 5, pa.string()),
                "turn_idx": pa.array([0, 1, 2, 3, 4], pa.int32()),
                "tool": pa.array(["", "grep", "", "bash", ""], pa.string()),
            }
        ),
        p,
    )
    t = tool_attribution(p).to_pandas().sort_values("turn_idx")
    assert t.last_tool.tolist() == ["", "grep", "grep", "bash", "bash"]


def test_response_latency_matches_duckdb():
    import __ray_entry__ as E

    got = _as_df(E.queries()["response_latency"](SF).to_pandas())
    exp = duckdb.connect().execute(
        E.oracle_sql()["response_latency"].replace(_TR01, TP)
    ).fetchdf()
    assert len(got) > 0
    _assert_value_match(got, exp)
    assert (got.sum_gap_us >= got.max_gap_us).all()
    assert ((got.n_pairs > 0) | ((got.sum_gap_us == 0) & (got.max_gap_us == 0))).all()
    assert (got.n_pairs > 0).any()


def test_kg_predicate_entropy_matches_duckdb():
    import numpy as np

    import __ray_entry__ as E

    got = _as_df(E.queries()["kg_predicate_entropy"](SF).to_pandas())
    exp = duckdb.connect().execute(
        E.oracle_sql()["kg_predicate_entropy"].replace(_KG01, KG_OUT)
    ).fetchdf()
    assert len(got) > 0
    _assert_value_match(got, exp)
    single = got[got.n_preds == 1]
    assert len(single) > 0
    assert (single.pred_entropy == 0.0).all()
    assert not np.signbit(single.pred_entropy.to_numpy()).any()  # +0.0, never -0.0
    multi = got[got.n_preds > 1]
    if len(multi):
        assert (multi.pred_entropy <= np.log(multi.n_preds) + 1e-9).all()


# ------------------------------------------------- round-4 batch 11


def test_hopping_window_counts_matches_duckdb():
    import __ray_entry__ as E

    got = _as_df(E.queries()["hopping_window_counts"](SF).to_pandas())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    exp = con.execute(E.oracle_sql()["hopping_window_counts"]).fetchdf()
    assert len(got) > 0
    _assert_value_match(got, exp)
    # every window start is a 15-min multiple and total memberships = 4x events
    assert (got.window_start_us % 900_000_000 == 0).all()
    n_events = con.execute("SELECT count(*) FROM events").fetchone()[0]
    assert got.n_events.sum() == 4 * n_events


def test_conv_partition_skew_matches_duckdb():
    import __ray_entry__ as E

    got = _as_df(E.queries()["conv_partition_skew"](SF).to_pandas())
    exp = duckdb.connect().execute(
        E.oracle_sql()["conv_partition_skew"].replace(_TR01, TP)
    ).fetchdf()
    assert len(got) > 0
    _assert_value_match(got, exp)
    # conservation: parts partition the corpus exactly
    import pyarrow.parquet as pq

    n_rows = pq.read_metadata(TP).num_rows
    assert got.n_turns.sum() == n_rows


def test_corpus_datasheet_matches_duckdb():
    import __ray_entry__ as E

    got = _as_df(E.queries()["corpus_datasheet"](SF))
    exp = _docs_con().execute(E.oracle_sql()["corpus_datasheet"]).fetchdf()
    assert len(got) == 1
    _assert_value_match(got, exp)
    r = got.iloc[0]
    assert r.n_distinct_texts <= r.n_docs and r.n_langs >= 1 and r.n_sources >= 1


# ------------------------------------------------- round-4 batch 12


def test_hybrid_search_rrf_matches_duckdb():
    import __ray_entry__ as E

    got = _as_df(E.queries()["hybrid_search_rrf"](SF))
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    exp = con.execute(E.oracle_sql()["hybrid_search_rrf"]).fetchdf()
    assert len(got) == 10
    _assert_value_match(got, exp)
    # fused score bounds: one list -> <= 1/61; both lists -> <= 2/61
    assert (got.rrf <= 2 / 61 + 1e-9).all() and (got.rrf > 0).all()


def test_hybrid_rrf_rewards_double_listing():
    """A doc present in BOTH top-m lists at mid rank must outscore a doc
    present in only one list at a similar rank (the RRF property)."""
    from chunksilo_ray.ops.text_search import bm25_topk, hybrid_search_rrf
    from chunksilo_ray.ops.similarity import cosine_topk

    lex = set(bm25_topk(SF, k=50)["doc_id"].to_pylist())
    den = set(cosine_topk(SF, k=50)["vec_id"].to_pylist())
    fused = _as_df(hybrid_search_rrf(SF, k=10))
    both = lex & den
    if both:
        # every fused top-10 member from a single list must not outrank a
        # same-rank double-listed member: weaker, checkable form — the
        # best double-listed doc appears in the fused top-10
        assert both & set(fused.doc_id.tolist())


def test_kg_edge_timestamps_matches_duckdb():
    import __ray_entry__ as E

    got = _as_df(E.queries()["kg_edge_timestamps"](SF).to_pandas())
    exp = duckdb.connect().execute(
        E.oracle_sql()["kg_edge_timestamps"].replace(_KG01, KG_OUT).replace(_TR01, TP)
    ).fetchdf()
    assert len(got) > 100
    _assert_value_match(got, exp)
    # consistency with provenance: mention totals equal the aggregated
    # edge-table weights (join multiplicity is exactly 1)
    con = duckdb.connect()
    tot = con.execute(
        f"SELECT CAST(SUM(weight) AS BIGINT) FROM read_parquet('{KG_OUT}/edges/*.parquet')"
    ).fetchone()[0]
    assert got.n_mentions.sum() == tot
