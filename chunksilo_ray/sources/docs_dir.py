"""Directory document source with per-format dispatch.

The Ray-Data re-expression of the reference's file loading surface
(reference src/chunksilo/index.py ``load_file`` dispatch + the scan filters
``_matches_patterns`` / ``_should_skip_directory``):

- the driver walks the tree ONCE to build the file list (cheap: names only,
  like the reference's scan phase) applying include patterns and directory
  skips;
- ``ray.data.read_binary_files`` then reads bytes distributed, and a single
  vectorized ``map_batches`` stage decodes + dispatches per extension:

    .md   -> text + fence-aware heading rows  (reference markdown path)
    .txt  -> plain text                        (reference text path)
    .json -> transcript/record flattening      (reference's Jira/Confluence
             record->text flattening, search.py "_jira_issue_to_text")

- undecodable or malformed files NEVER kill the batch: they emit a row with
  empty text and an ``error`` marker (the reference logs-and-skips,
  index.py:1355-1360; here the dead letter is a first-class column, same
  policy as the KG extraction stage).

PDF / DOCX dispatch is out of scope for this environment (no binary-doc
libraries in the container — COVERAGE.md §2.1); the dispatch table is where
they would drop in.
"""

from __future__ import annotations

import fnmatch
import json
import os
import pathlib

import pyarrow as pa
import ray.data as rd
from ray.data import Dataset

from ..ops.text_search import extract_markdown_headings

DEFAULT_INCLUDE = ("*.md", "*.txt", "*.json")
DEFAULT_SKIP_DIRS = (".*", "__pycache__", "node_modules")


def iter_doc_files(
    root: str,
    include: tuple[str, ...] = DEFAULT_INCLUDE,
    skip_dirs: tuple[str, ...] = DEFAULT_SKIP_DIRS,
) -> list[str]:
    """Deterministic (sorted) file list under ``root`` with the reference's
    filter semantics: basename include patterns, directory-name skips."""
    out: list[str] = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = sorted(
            d for d in dirnames if not any(fnmatch.fnmatch(d, p) for p in skip_dirs)
        )
        for f in sorted(filenames):
            if any(fnmatch.fnmatch(f, p) for p in include):
                out.append(os.path.join(dirpath, f))
    return out


def _flatten_record(obj) -> str:
    """Record -> text flattening (the Jira/Confluence analog): transcript
    lists become "<role>: <text>" lines; dicts become "key: value" lines."""
    if isinstance(obj, list):
        lines = []
        for turn in obj:
            if isinstance(turn, dict):
                role = str(turn.get("role", ""))
                text = str(turn.get("text", ""))
                lines.append(f"{role}: {text}" if role else text)
            else:
                lines.append(str(turn))
        return "\n".join(lines)
    if isinstance(obj, dict):
        return "\n".join(f"{k}: {v}" for k, v in obj.items())
    return str(obj)


def _decode_dispatch(t: pa.Table) -> pa.Table:
    paths = t["path"].to_pylist()
    blobs = t["bytes"].to_pylist()
    fmts, texts, headings, errors = [], [], [], []
    for path, blob in zip(paths, blobs):
        suffix = pathlib.Path(path).suffix.lower()
        fmt = suffix.lstrip(".") or "unknown"
        text, hs, err = "", [], None
        try:
            raw = blob.decode("utf-8")  # strict: undecodable -> dead letter
            if suffix == ".json":
                text = _flatten_record(json.loads(raw))
            else:
                text = raw
            if suffix == ".md":
                hs = [
                    f"{h['level']}\x1f{h['text']}"
                    for h in extract_markdown_headings(raw)
                ]
        except Exception as exc:  # noqa: BLE001 - dead-letter boundary
            text, hs = "", []
            err = f"{type(exc).__name__}: {exc}"[:200]
        fmts.append(fmt)
        texts.append(text)
        headings.append(hs)
        errors.append(err)
    return pa.table(
        {
            "doc_path": pa.array(paths, pa.string()),
            "fmt": pa.array(fmts, pa.string()),
            "text": pa.array(texts, pa.string()),
            "headings": pa.array(headings, pa.list_(pa.string())),
            "error": pa.array(errors, pa.string()),
        }
    )


def read_docs_dir(
    root: str,
    include: tuple[str, ...] = DEFAULT_INCLUDE,
    skip_dirs: tuple[str, ...] = DEFAULT_SKIP_DIRS,
) -> Dataset:
    """documents Dataset over a file tree: (doc_path, fmt, text, headings,
    error). Byte reads and decoding are distributed; the driver only holds
    file NAMES. Empty tree -> empty Dataset with the stable schema."""
    files = iter_doc_files(root, include, skip_dirs)
    if not files:
        return rd.from_arrow(
            pa.schema(
                [
                    ("doc_path", pa.string()),
                    ("fmt", pa.string()),
                    ("text", pa.string()),
                    ("headings", pa.list_(pa.string())),
                    ("error", pa.string()),
                ]
            ).empty_table()
        )
    ds = rd.read_binary_files(files, include_paths=True)
    return ds.map_batches(_decode_dispatch, batch_format="pyarrow", batch_size=None)
