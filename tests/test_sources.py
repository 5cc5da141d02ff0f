"""Format-dispatch directory source (reference load_file dispatch +
_matches_patterns/_should_skip_directory filter semantics)."""

import json

import pytest

from chunksilo_ray.sources.docs_dir import iter_doc_files, read_docs_dir


@pytest.fixture()
def doc_tree(tmp_path):
    (tmp_path / "a.md").write_text("# Title\n\nbody\n```\n# not a heading\n```\n## Sub\n")
    (tmp_path / "b.txt").write_text("plain text file\n")
    (tmp_path / "c.json").write_text(
        json.dumps([{"role": "user", "text": "hi"}, {"role": "assistant", "text": "yo"}])
    )
    (tmp_path / "broken.json").write_text("{not json")
    (tmp_path / "bad_utf8.txt").write_bytes(b"\xff\xfe\xff garbage")
    (tmp_path / "skipme.py").write_text("print()")  # not in include patterns
    hidden = tmp_path / ".git"
    hidden.mkdir()
    (hidden / "ignored.md").write_text("# hidden\n")
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "d.md").write_text("# Deep\n")
    return tmp_path


def test_iter_doc_files_filters(doc_tree):
    files = iter_doc_files(str(doc_tree))
    names = [f.rsplit("/", 1)[-1] for f in files]
    assert "a.md" in names and "b.txt" in names and "c.json" in names
    assert "d.md" in names  # recursion
    assert "skipme.py" not in names  # include patterns
    assert "ignored.md" not in names  # hidden-dir skip


@pytest.mark.usefixtures("ray_session")
def test_read_docs_dir_dispatch_and_dead_letters(doc_tree):
    rows = {r["doc_path"].rsplit("/", 1)[-1]: r for r in read_docs_dir(str(doc_tree)).take_all()}
    assert len(rows) == 6

    md = rows["a.md"]
    assert md["fmt"] == "md" and md["error"] is None
    # fence-aware: the fenced '# not a heading' is skipped
    assert md["headings"] == ["1\x1fTitle", "2\x1fSub"]

    txt = rows["b.txt"]
    assert txt["text"] == "plain text file\n" and txt["headings"] == []

    js = rows["c.json"]
    assert js["text"] == "user: hi\nassistant: yo"

    # dead letters: malformed json + undecodable bytes survive as rows
    assert rows["broken.json"]["error"] is not None
    assert rows["broken.json"]["text"] == ""
    assert rows["bad_utf8.txt"]["error"] is not None


@pytest.mark.usefixtures("ray_session")
def test_read_docs_dir_empty_tree(tmp_path):
    ds = read_docs_dir(str(tmp_path))
    assert ds.count() == 0
    assert "doc_path" in ds.schema().names
