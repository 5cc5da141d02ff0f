"""CLI surface tests (reference test_cli.py layer) — arg parsing and
dump-defaults run in-process; build/search are covered by the e2e suite
through the library API and by the verify flow through subprocesses."""

import json

import pytest

from chunksilo_ray.cli import main


def test_dump_defaults_yaml(capsys):
    assert main(["dump-defaults"]) == 0
    out = capsys.readouterr().out
    import yaml

    cfg = yaml.safe_load(out)
    assert cfg["chunking"]["chunk_size"] == 512
    assert cfg["canon"]["bands"] == 32


def test_requires_subcommand():
    with pytest.raises(SystemExit):
        main([])


def test_build_requires_args():
    with pytest.raises(SystemExit):
        main(["build"])  # missing --input/--alias/--out


def test_config_yaml_roundtrip(tmp_path):
    from chunksilo_ray.config import Config

    p = tmp_path / "cfg.yaml"
    p.write_text("chunking:\n  chunk_size: 128\nsearch:\n  rerank_top_k: 3\n")
    cfg = Config.from_yaml(str(p))
    assert cfg.get("chunking.chunk_size") == 128
    assert cfg.get("chunking.chunk_overlap") == 50  # defaults survive merge
    assert cfg.get("search.rerank_top_k") == 3
    assert cfg.get("nope.missing", "dflt") == "dflt"
