"""Text-analysis operators over the ``documents`` table (task brief: language
ID, quality scoring, token counting, document fingerprinting) — the
training-data-pipeline staples, each as a vectorized map_batches stage.

Column names match the oracle SQL in __ray_entry__.oracle_sql() where the
semantics are SQL-expressible; heuristics that aren't (n-gram language ID,
rolling-hash fingerprints) ship rows-only checks.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Count, Mean

_WORD_RE = re.compile(r"[A-Za-z0-9]+")

# tiny per-language stopword profiles for the n-gram/stopword language
# heuristic (public-knowledge lists; langid libs aren't in this container)
_LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is you that it he was for on are as with".split()),
    "de": frozenset("der die und in den von zu das mit sich des auf ist nicht".split()),
    "fr": frozenset("le la et les des en un du une que est pour qui dans".split()),
    "es": frozenset("el la de que y en un los se del las por con una".split()),
}


def _docs(sf_dir: str, columns: list[str] | None = None) -> Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def doc_token_counts(sf_dir: str) -> Dataset:
    """doc_id + n_tokens (alnum-run tokens) + n_chars — SQL-matchable via
    DuckDB regexp_extract_all length."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def g(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n_tok = [len(_WORD_RE.findall(x)) for x in texts]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
            }
        )

    return ds.map_batches(g, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def docs_by_lang(sf_dir: str) -> Dataset:
    """Grouped doc counts + mean length per language tag."""
    ds = _docs(sf_dir, ["lang", "n_chars"])
    agg = ds.groupby("lang").aggregate(
        Count(alias_name="n_docs"), Mean("n_chars", alias_name="avg_chars")
    )
    from .relational import round_columns

    return round_columns(agg, ["avg_chars"])


class LangIdActor:
    """Stopword-profile language ID (n-gram heuristic): stateful stage —
    profiles + regex compiled once per actor (reference pattern: stateful
    stages table, SURVEY.md §2.3)."""

    def __init__(self):
        self.word = _WORD_RE
        self.profiles = {k: v for k, v in _LANG_PROFILES.items()}

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        langs: list[str] = []
        scores: list[float] = []
        for x in texts:
            toks = [w.lower() for w in self.word.findall(x)]
            if not toks:
                langs.append("und")
                scores.append(0.0)
                continue
            best_lang, best = "und", 0.0
            for lang, prof in self.profiles.items():
                hit = sum(1 for w in toks if w in prof) / len(toks)
                if hit > best:
                    best_lang, best = lang, hit
            langs.append(best_lang if best > 0.05 else "und")
            scores.append(round(best, 6))
        out = t.select([c for c in ("doc_id",) if c in t.column_names])
        out = out.append_column("pred_lang", pa.array(langs, pa.string()))
        out = out.append_column("lang_score", pa.array(scores, pa.float64()))
        return out


def detect_language(sf_dir: str) -> Dataset:
    ds = _docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(LangIdActor, batch_format="pyarrow", batch_size=None, concurrency=(1, 4),
                          zero_copy_batch=True)


def quality_scores(sf_dir: str) -> Dataset:
    """Heuristic quality metrics: length, punctuation ratio, stopword ratio,
    mean word length — the standard pretraining-corpus quality gates, fully
    vectorized per batch."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    from ..functions.textutils import STOPWORDS

    def f(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n = len(texts)
        n_chars = np.empty(n, np.int64)
        punct_ratio = np.empty(n, np.float64)
        stop_ratio = np.empty(n, np.float64)
        mean_word_len = np.empty(n, np.float64)
        for i, x in enumerate(texts):
            n_chars[i] = len(x)
            words = _WORD_RE.findall(x)
            n_alnum = sum(len(w) for w in words)
            punct_ratio[i] = 0.0 if not x else 1.0 - n_alnum / len(x)
            if words:
                stop_ratio[i] = sum(1 for w in words if w.lower() in STOPWORDS) / len(words)
                mean_word_len[i] = n_alnum / len(words)
            else:
                stop_ratio[i] = 0.0
                mean_word_len[i] = 0.0
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": pa.array(n_chars),
                "punct_ratio": pa.array(np.round(punct_ratio, 6)),
                "stop_ratio": pa.array(np.round(stop_ratio, 6)),
                "mean_word_len": pa.array(np.round(mean_word_len, 6)),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def fingerprint_docs(sf_dir: str, window: int = 64) -> Dataset:
    """Rolling-hash document fingerprint: crc32 over sliding character
    windows, keep the minimum (a 1-perm MinHash — deterministic winnowing-
    style fingerprint)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        fps = []
        full = []
        for x in texts:
            data = x.encode("utf-8", "ignore")
            full.append(zlib.crc32(data))
            if len(data) <= window:
                fps.append(zlib.crc32(data))
            else:
                fps.append(
                    min(
                        zlib.crc32(data[i : i + window])
                        for i in range(0, len(data) - window + 1, window // 2)
                    )
                )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "fingerprint": pa.array(fps, pa.int64()),
                "content_crc": pa.array(full, pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def sample_docs_by_hash(sf_dir: str) -> Dataset:
    """Deterministic ~1/16 sample: keep docs whose md5(text) starts with
    '0' — the seeded, rerun-stable sampling a training pipeline needs
    (FIXTURES.md: deterministic sampling by content hash). SQL-matchable."""
    import hashlib

    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        keep = [
            hashlib.md5(x.encode("utf-8")).hexdigest().startswith("0")
            for x in t["text"].to_pylist()
        ]
        return t.filter(pa.array(keep, pa.bool_())).select(["doc_id"])

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def quality_filter(sf_dir: str, min_chars: int = 200, max_symbol_ratio: float = 0.05) -> Dataset:
    """Quality gate: keep docs long enough and with a low symbol
    (non-alnum-space-punct-basic) ratio — the pretraining-corpus filter
    shape, expressed with char-class metrics both engines compute
    identically (SQL oracle via regexp_replace)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        import re as _re

        sym = _re.compile(r"[^A-Za-z0-9 .,]")
        ids, chars, ratios = [], [], []
        for did, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            n = len(x)
            if n < min_chars:
                continue
            r = len(sym.findall(x)) / n
            if r <= max_symbol_ratio:
                ids.append(did)
                chars.append(n)
                ratios.append(round(r, 6))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_chars": pa.array(chars, pa.int64()),
                "symbol_ratio": pa.array(ratios, pa.float64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
