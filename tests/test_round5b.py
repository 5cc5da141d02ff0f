"""Round-5 batch B: incremental-ingest state persistence + dead-letter
surfacing (the verdict's item 7 and the groundwork for `build --append`)."""

import json
import pathlib

import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _run(smoke_corpus, out_dir, **kw):
    from chunksilo_ray.pipelines.kg import build_kg

    return build_kg(
        f"{smoke_corpus}/transcripts.parquet",
        f"{smoke_corpus}/alias_index.parquet",
        out_dir,
        **kw,
    )


def test_state_persisted_for_append(smoke_corpus, tmp_out):
    """A tracked build leaves out/state/ with the conv-id manifest, the
    distinct-norm vocabulary, and the build parameters `append_kg` needs."""
    res = _run(smoke_corpus, tmp_out, with_chunks=False)
    state = pathlib.Path(tmp_out) / "state"

    conv_ids = pq.read_table(str(state / "conv_ids"))
    convs = set(conv_ids["conv_id"].to_pylist())
    src = pq.read_table(f"{smoke_corpus}/transcripts.parquet", columns=["conv_id"])
    assert convs == set(src["conv_id"].to_pylist())

    norms = pq.read_table(str(state / "distinct_norms.parquet"))
    assert norms.num_rows > 0
    # every canonical-map key is an observed unknown norm
    cmap = json.loads((pathlib.Path(tmp_out) / "canonical_map.json").read_text())["map"]
    assert set(cmap) <= set(norms["norm"].to_pylist())

    info = json.loads((state / "build_info.json").read_text())
    assert info["alias_path"].endswith("alias_index.parquet")
    assert info["appends"] == []
    assert "canon" in info["sections"]

    # clean corpus: no dead letters, no dead_letter partition
    assert res["metrics"]["dead_letter_turns"] == 0
    assert res["metrics"]["dead_letter_path"] is None
    assert not (pathlib.Path(tmp_out) / "dead_letter").exists()


def test_tracking_opt_out(smoke_corpus, tmp_path):
    from chunksilo_ray.config import Config

    cfg = Config({"incremental": {"track": False}})
    out = str(tmp_path / "kg_untracked")
    _run(smoke_corpus, out, cfg=cfg, with_chunks=False)
    assert not (pathlib.Path(out) / "state").exists()


def test_dead_letter_partition(smoke_corpus, tmp_path):
    """Poison policy e2e: with a zero per-row wall-clock budget every row
    dead-letters; the rows land in a queryable out/dead_letter/ Parquet
    partition with (conv_id, turn_idx, error) and the count matches."""
    from chunksilo_ray.config import Config

    cfg = Config({"linking": {"per_row_seconds": 0.0}})
    out = str(tmp_path / "kg_poison")
    res = _run(smoke_corpus, out, cfg=cfg, with_chunks=False)

    n_turns = pq.read_metadata(f"{smoke_corpus}/transcripts.parquet").num_rows
    assert res["metrics"]["dead_letter_turns"] == n_turns
    dl = pq.read_table(res["metrics"]["dead_letter_path"])
    assert dl.num_rows == n_turns
    assert set(dl.column_names) == {"conv_id", "turn_idx", "error"}
    errs = dl["error"].to_pylist()
    assert all(e.startswith("TimeBudgetExceeded") for e in errs)
    # dead-lettered rows emit no triples: the graph is empty
    assert res["metrics"]["edges"] == 0
