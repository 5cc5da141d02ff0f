"""Canonicalization unit + distributed tests."""

import pyarrow as pa
import pytest

import ray.data as rd

from chunksilo_ray.stages import canon


def test_minhash_deterministic_across_calls():
    a, b = canon._hash_params(64)
    s1 = canon.minhash_signature("flu-metrics", a, b)
    s2 = canon.minhash_signature("flu-metrics", a, b)
    assert (s1 == s2).all()


def test_union_find_deterministic_canonical():
    cmap = canon.canonical_map_from_edges([("b", "c"), ("a", "b"), ("d", "e")])
    assert cmap == {"b": "a", "c": "a", "e": "d"}


def test_verify_pair_thresholds():
    assert canon.verify_pair("flumetrics", "flu-metrics")
    assert not canon.verify_pair("flumetrics", "zorp-dash")


@pytest.mark.usefixtures("ray_session")
def test_distributed_lsh_finds_family_clusters():
    surfaces = [
        ("flumetrics", False),
        ("flu-metrics", False),
        ("flumetric", False),
        ("zorpdash", False),
        ("zorp-dash", False),
        ("database", True),  # known -> must be ignored
        ("unrelated-thing", False),
    ]
    t = pa.table(
        {
            "norm": pa.array([s for s, _ in surfaces] * 3),  # duplicates on purpose
            "known": pa.array([k for _, k in surfaces] * 3),
        }
    )
    cmap = canon.build_canonical_map(rd.from_arrow(t))
    assert cmap.get("flumetrics") == "flu-metrics" or cmap.get("flu-metrics") in (
        "flumetric",
        "flumetrics",
    )
    # all three flu variants end up with ONE canonical representative
    reps = {cmap.get(n, n) for n in ("flumetrics", "flu-metrics", "flumetric")}
    assert len(reps) == 1
    reps_z = {cmap.get(n, n) for n in ("zorpdash", "zorp-dash")}
    assert len(reps_z) == 1
    assert "database" not in cmap
    assert "unrelated-thing" not in cmap


def test_canonicalize_id_rewrites_only_placeholders():
    cmap = {"flumetrics": "flu-metrics"}
    assert canon.canonicalize_id("surface:flumetrics", cmap) == "ent:flu-metrics"
    assert canon.canonicalize_id("surface:other", cmap) == "ent:other"
    assert canon.canonicalize_id("system:database", cmap) == "system:database"
