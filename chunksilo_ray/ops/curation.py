"""Corpus-curation operators a large-scale training-data pipeline needs:
test-set decontamination, Gopher-style repetition filtering, global
vocabulary building, and deterministic source mixing. All over the
``documents`` table, all with exact DuckDB oracles in __ray_entry__.

Scale notes per operator are inline; the common shape is: broadcast the
small side once, keep the per-batch kernel vectorized (polars / Arrow), and
make every exchange vocabulary- or stratum-bounded, never O(corpus rows).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Sum

# held-out "benchmark" slice for decontamination: every doc_id = 7 (mod 100).
# Real pipelines ship a fixed eval-set shingle list; the modulus gives a
# deterministic, scale-proportional stand-in both engines can compute.
_PROBE_MOD = 100
_PROBE_RESIDUE = 7
_PROBE_LEN = 40
_MIN_PROBE_LEN = 20


def _docs(sf_dir: str, columns: list[str] | None = None) -> Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# worker-global compiled-alternation memo (pattern built once per worker,
# not per batch — the stateless-task analog of actor __init__ state)
_PROBE_RE_MEMO: dict[str, re.Pattern | None] = {}


def decontaminate_docs(sf_dir: str) -> Dataset:
    """Test-set decontamination: drop every training document that contains
    any probe string from the held-out slice (probes = first _PROBE_LEN
    chars of each held-out doc). Returns surviving (doc_id) rows.

    Scale shape: the probe list is the EVAL set — small by construction —
    so it broadcasts (ray.put once, compiled to one alternation regex once
    per worker); the corpus streams through a single vectorized
    match_substring_regex scan. No exchange at all."""
    def _probe_part(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sub = t.filter(pa.array(ids % _PROBE_MOD == _PROBE_RESIDUE))
        p = pc.utf8_slice_codeunits(sub["text"], 0, _PROBE_LEN)
        p = p.filter(pc.greater_equal(pc.utf8_length(p), _MIN_PROBE_LEN))
        return pa.table({"p": p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p})

    held = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(_probe_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .take_all()
    )
    probes = sorted({r["p"] for r in held})
    probes_ref = ray.put(probes)

    def f(t: pa.Table) -> pa.Table:
        from ..util import cached_get

        key = probes_ref.hex()
        pat = _PROBE_RE_MEMO.get(key, False)
        if pat is False:
            if len(_PROBE_RE_MEMO) > 4:
                _PROBE_RE_MEMO.clear()
            ps = cached_get(probes_ref)
            pat = re.compile("|".join(re.escape(p) for p in ps)) if ps else None
            _PROBE_RE_MEMO[key] = pat
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        train = ids % _PROBE_MOD != _PROBE_RESIDUE
        if pat is None:
            return t.filter(pa.array(train)).select(["doc_id"])
        hit = pc.match_substring_regex(t["text"], pat.pattern).to_numpy(
            zero_copy_only=False
        )
        return t.filter(pa.array(train & ~hit)).select(["doc_id"])

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def doc_line_repetition(sf_dir: str, max_dup_frac: float = 0.30) -> Dataset:
    """Gopher-style repetition signal: per document, the fraction of lines
    that are duplicates of an earlier line (1 - distinct/total). Emits
    (doc_id, n_lines, n_distinct_lines, dup_line_frac, keep) — ``keep``
    is the filter verdict at ``max_dup_frac``. Pure per-row map: perfectly
    parallel at any scale."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        from ..util import polars_safe

        pl = polars_safe()
        df = pl.from_arrow(t.select(["text"]))
        lines = df.select(pl.col("text").str.split("\n").alias("l"))
        n = lines.select(pl.col("l").list.len().cast(pl.Int64).alias("n"))["n"].to_numpy()
        nd = lines.select(pl.col("l").list.n_unique().cast(pl.Int64).alias("d"))["d"].to_numpy()
        # half-away-from-zero rounding (SQL ROUND), not numpy's banker's —
        # exact 5-at-digit-7 values (e.g. 1/128) must round the same way
        frac = np.floor((1.0 - nd / np.maximum(n, 1)) * 1e6 + 0.5) / 1e6
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_lines": pa.array(n, pa.int64()),
                "n_distinct_lines": pa.array(nd, pa.int64()),
                "dup_line_frac": pa.array(frac, pa.float64()),
                "keep": pa.array(frac <= max_dup_frac),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def top_bigrams(sf_dir: str, k: int = 50) -> Dataset:
    """Global top-k word bigrams (vocabulary building / n-gram LM stats).

    Scale shape: bigram counting is a per-batch PARTIAL (polars group_by
    inside the batch), so the only exchange is one row per distinct bigram
    per block — vocabulary-bounded, never O(corpus tokens). The global
    groupby-sum output is again vocabulary-sized; per-block local top-k then
    a tiny driver merge avoids a global sort."""
    ds = _docs(sf_dir, ["text"])

    def partial(t: pa.Table) -> pa.Table:
        from ..util import polars_safe

        pl = polars_safe()
        df = pl.from_arrow(t.select(["text"])).with_row_index("__doc")
        ex = (
            df.select(
                "__doc",
                pl.col("text")
                .str.to_lowercase()
                .str.replace_all("[^a-z0-9]+", " ")
                .str.split(" ")
                .alias("w"),
            )
            .explode("w")
            .filter(pl.col("w") != "")
        )
        ex = ex.with_columns(pl.col("w").shift(-1).over("__doc").alias("w2")).drop_nulls(
            "w2"
        )
        bg = (
            ex.select((pl.col("w") + " " + pl.col("w2")).alias("bigram"))
            .group_by("bigram")
            .len(name="n")
        )
        out = bg.to_arrow()
        return pa.table(
            {
                "bigram": out["bigram"].cast(pa.string()),
                "n": out["n"].cast(pa.int64()),
            }
        )

    counts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).groupby("bigram").aggregate(Sum("n", alias_name="n"))

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        idx = pc.select_k_unstable(
            t, k, sort_keys=[("n", "descending"), ("bigram", "ascending")]
        )
        return t.take(idx)

    # driver merge of the per-block top-k (blocks x k rows, tiny)
    blocks = [
        b
        for b in ray.get(
            counts.map_batches(
                local_topk, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
            ).to_arrow_refs()
        )
        if b.num_rows
    ]
    if not blocks:
        tbl = pa.table({"bigram": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    else:
        allb = pa.concat_tables(blocks)
        idx = pc.select_k_unstable(
            allb, k, sort_keys=[("n", "descending"), ("bigram", "ascending")]
        )
        tbl = allb.take(idx)
    return rd.from_arrow(tbl)


# PII patterns shared byte-for-byte with the DuckDB oracle: both pyarrow
# (count/replace_substring_regex) and DuckDB regexp_* are RE2, so the scan
# and the redaction are EXACTLY cross-checkable. Leftmost non-overlapping
# semantics match on both sides.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\d{3}[-.]\d{3}[-.]\d{4}"


def redact_pii(sf_dir: str) -> Dataset:
    """PII detection + redaction over the corpus: count and mask email
    addresses and US-style phone numbers. Emits (doc_id, n_emails,
    n_phones, pii_free, redacted). Pure per-row vectorized map (two RE2
    kernels per batch, compiled once inside Arrow) — perfectly parallel;
    the redacted text column is the same size class as the input, so block
    sizes are unchanged. Constructed-positive gate (corpus has no PII):
    tests/test_curation.py::test_redact_pii_positive."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        n_em = pc.cast(pc.count_substring_regex(t["text"], _PII_EMAIL), pa.int64())
        n_ph = pc.cast(pc.count_substring_regex(t["text"], _PII_PHONE), pa.int64())
        red = pc.replace_substring_regex(t["text"], _PII_EMAIL, "[EMAIL]")
        red = pc.replace_substring_regex(red, _PII_PHONE, "[PHONE]")
        free = pc.and_(pc.equal(n_em, 0), pc.equal(n_ph, 0))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_emails": n_em,
                "n_phones": n_ph,
                "pii_free": free,
                "redacted": red,
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def doc_bigram_repetition(sf_dir: str, max_top_frac: float = 0.125) -> Dataset:
    """Gopher-style top-2-gram repetition: per document, the fraction of
    all word bigrams taken by the single most frequent one (boilerplate /
    template detector — natural text stays low, generated spam spikes).
    Emits (doc_id, n_bigrams, top_n, top_bigram_frac, keep). Only counts
    are emitted (not the winning bigram) so ties cannot affect the output.
    Per-row map over in-batch polars group_bys — no exchange."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        from ..util import polars_safe

        pl = polars_safe()
        df = pl.from_arrow(t.select(["doc_id", "text"]))
        ex = (
            df.select(
                "doc_id",
                pl.col("text")
                .str.to_lowercase()
                .str.replace_all("[^a-z0-9]+", " ")
                .str.split(" ")
                .alias("w"),
            )
            .explode("w")
            .filter(pl.col("w") != "")
        )
        ex = ex.with_columns(pl.col("w").shift(-1).over("doc_id").alias("w2")).drop_nulls("w2")
        per = (
            ex.group_by("doc_id", pl.col("w") + " " + pl.col("w2"))
            .len(name="c")
            .group_by("doc_id")
            .agg(pl.col("c").sum().alias("n_bigrams"), pl.col("c").max().alias("top_n"))
        )
        out = (
            df.select("doc_id")
            .join(per, on="doc_id", how="left")
            .with_columns(pl.col("n_bigrams").fill_null(0), pl.col("top_n").fill_null(0))
        ).to_arrow()
        n = out["n_bigrams"].to_numpy().astype(np.float64)
        top = out["top_n"].to_numpy().astype(np.float64)
        # half-away-from-zero rounding to match SQL ROUND
        frac = np.floor(top / np.maximum(n, 1) * 1e6 + 0.5) / 1e6
        return pa.table(
            {
                "doc_id": out["doc_id"].cast(pa.int64()),
                "n_bigrams": out["n_bigrams"].cast(pa.int64()),
                "top_n": out["top_n"].cast(pa.int64()),
                "top_bigram_frac": pa.array(frac, pa.float64()),
                "keep": pa.array(frac <= max_top_frac),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


# mixture thresholds by source index (mod 4): hex-string prefix gates — a
# deterministic stand-in for the per-source sampling weights of a
# data-mixing recipe (None = keep all, '8000' = 1/2, '4000' = 1/4; fixed
# 4-hex-digit strings compare exactly like the 16-bit integers they encode)
_MIX_GATES: dict[int, str | None] = {0: None, 1: "8000", 2: "8000", 3: "4000"}


def mix_sources(sf_dir: str) -> Dataset:
    """Deterministic weighted source mixing: keep each document with
    probability rate(source), gated by a content-hash prefix compare — the
    rerun-stable sampling a data-mixing recipe needs (rate by source index
    mod 4). Emits surviving (doc_id, source). Pure per-row map; the md5
    gate makes resumes and re-runs pick the identical subset."""
    ds = _docs(sf_dir, ["doc_id", "text", "source"])

    def f(t: pa.Table) -> pa.Table:
        srcs = t["source"].to_pylist()
        texts = t["text"].to_pylist()
        keep = np.zeros(t.num_rows, dtype=bool)
        for i, (s, x) in enumerate(zip(srcs, texts)):
            gate = _MIX_GATES[int(s[3:]) % 4]
            keep[i] = (
                gate is None
                or hashlib.md5(x.encode("utf-8")).hexdigest()[:4] < gate
            )
        return t.filter(pa.array(keep)).select(["doc_id", "source"])

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def _explode_paras(t: pa.Table):
    """Polars frame (doc_id, idx, para): a documents batch exploded into
    paragraphs (split on blank line). idx is the 0-based paragraph position
    within its document — needed to rebuild text in document order."""
    from ..util import polars_safe

    pl = polars_safe()
    df = pl.from_arrow(t.select(["doc_id", "text"]))
    return (
        df.with_columns(pl.col("text").str.split(_PARA_SEP).alias("para"))
        .drop("text")
        .with_columns(pl.int_ranges(pl.col("para").list.len()).alias("idx"))
        .explode(["para", "idx"])
    )


_PARA_SEP = "\n\n"
# dup-paragraph vocabularies beyond this row count stop being broadcastable
# (8 B/hash -> ~16 MB at the default); past it the op degrades to the
# shuffle path that never collects anything on the driver.
_PARA_BROADCAST_LIMIT = 2_000_000


def paragraph_dedup(
    sf_dir: str, min_count: int = 2, broadcast_limit: int = _PARA_BROADCAST_LIMIT
) -> Dataset:
    """Corpus-global paragraph dedup (Dolma/RefinedWeb-style): drop every
    paragraph whose exact text occurs >= min_count times ACROSS the corpus,
    and rebuild each document from its surviving paragraphs. Emits
    (doc_id, n_paras, n_kept, clean_text); clean_text is NULL when nothing
    survives.

    Scale shape, broadcast path (default): pass 1 counts paragraphs with a
    per-batch partial (one row per distinct paragraph per block) feeding a
    vocabulary-bounded groupby-sum; only paragraphs that clear min_count —
    the duplicated vocabulary, small by construction on real corpora — are
    collected, as 8-byte siphashes, and broadcast once (ray.put +
    worker-global cache). Pass 2 streams the corpus through one vectorized
    explode -> searchsorted-membership -> group-rebuild kernel; document
    text never enters an exchange. Past ``broadcast_limit`` distinct dup
    paragraphs the op switches to a two-exchange shuffle path (groupby(para)
    marks dups with exact group sizes, groupby(doc_id) rebuilds) that keeps
    everything distributed. Membership transport is the 64-bit pandas
    siphash (fixed key, process-stable); dup DETECTION is exact text
    equality in both paths and in the DuckDB oracle."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def count_part(t: pa.Table) -> pa.Table:
        from ..util import polars_safe

        pl = polars_safe()
        agg = _explode_paras(t).group_by("para").agg(
            pl.len().cast(pl.Int64).alias("cnt")
        )
        return agg.select(["para", "cnt"]).to_arrow()

    counts = (
        ds.map_batches(count_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby("para")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def dup_hashes(t: pa.Table) -> pa.Table:
        from pandas.util import hash_array

        sub = t.filter(pc.greater_equal(t["cnt"], min_count))
        h = hash_array(sub["para"].to_numpy(zero_copy_only=False), categorize=False)
        return pa.table({"h": pa.array(h.astype(np.uint64), pa.uint64())})

    dups = counts.map_batches(
        dup_hashes, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()

    if dups.count() > broadcast_limit:
        return _paragraph_dedup_shuffle(ds, min_count)

    harr = np.sort(
        np.concatenate(
            [b["h"].to_numpy() for b in dups.iter_batches(batch_format="pyarrow")]
            or [np.empty(0, np.uint64)]
        )
    )
    href = ray.put(harr)

    def rebuild(t: pa.Table) -> pa.Table:
        from pandas.util import hash_array

        from ..util import cached_get, polars_safe

        pl = polars_safe()
        arr = cached_get(href)
        ex = _explode_paras(t)
        h = hash_array(ex["para"].to_numpy(), categorize=False).astype(np.uint64)
        if arr.size:
            pos = np.searchsorted(arr, h)
            dup = (pos < arr.size) & (arr[np.minimum(pos, arr.size - 1)] == h)
        else:
            dup = np.zeros(h.size, bool)
        keep = pl.col("dup").not_()
        out = (
            ex.with_columns(pl.Series("dup", dup))
            # safe batch-locally: documents is one row per doc, so every
            # paragraph of a doc lives in the batch that exploded it
            .group_by("doc_id", maintain_order=True)
            .agg(
                pl.len().cast(pl.Int64).alias("n_paras"),
                keep.sum().cast(pl.Int64).alias("n_kept"),
                pl.col("para").filter(keep).str.join(_PARA_SEP).alias("clean_text"),
            )
            .with_columns(
                pl.when(pl.col("n_kept") > 0)
                .then(pl.col("clean_text"))
                .otherwise(None)
                .alias("clean_text")
            )
        )
        return out.to_arrow().cast(_PARA_DEDUP_SCHEMA)

    return ds.map_batches(
        rebuild, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


_PARA_DEDUP_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_paras", pa.int64()),
        ("n_kept", pa.int64()),
        ("clean_text", pa.string()),
    ]
)


def _paragraph_dedup_shuffle(ds: Dataset, min_count: int) -> Dataset:
    """Fully distributed fallback: exact dup marking inside a groupby(para)
    (group size IS the global count — no second structure needed), then a
    groupby(doc_id) rebuild. Two all-to-all exchanges of the exploded text,
    zero driver state; the price of a dup vocabulary too big to broadcast."""
    import pandas as pd

    exploded = ds.map_batches(
        lambda t: _explode_paras(t).to_arrow(),
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
    )

    def mark(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g[["doc_id", "idx", "para"]].copy()
        g["dup"] = len(g) >= min_count
        return g

    def rebuild(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values("idx")
        kept = g.loc[~g["dup"], "para"]
        return pd.DataFrame(
            {
                "doc_id": [g["doc_id"].iloc[0]],
                "n_paras": [len(g)],
                "n_kept": [int((~g["dup"]).sum())],
                "clean_text": [_PARA_SEP.join(kept) if len(kept) else None],
            }
        )

    return (
        exploded.groupby("para")
        .map_groups(mark, batch_format="pandas")
        .groupby("doc_id")
        .map_groups(rebuild, batch_format="pandas")
    )


def normalize_docs(sf_dir: str) -> Dataset:
    """Text normalization (the first stage of every curation pipeline):
    lowercase, collapse runs of ASCII whitespace to one space, trim. The
    whole kernel is Arrow compute (utf8_lower + RE2 replace + trim) on
    zero-copy batches — no Python string ever materializes. The whitespace
    class is written out explicitly ([ \\t\\r\\n]) because RE2's \\s and
    Python's unicode \\s disagree; explicit classes keep the Ray kernel and
    the DuckDB oracle (also RE2) bit-identical."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def norm(t: pa.Table) -> pa.Table:
        s = pc.utf8_lower(t["text"])
        s = pc.replace_substring_regex(s, pattern="[ \t\r\n]+", replacement=" ")
        s = pc.utf8_trim(s, characters=" ")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "norm_text": s,
                "n_chars_norm": pc.cast(pc.utf8_length(s), pa.int64()),
            }
        )

    return ds.map_batches(norm, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


_WIN_K = 8
# same budget/fallback reasoning as paragraph_dedup: the duplicated-window
# vocabulary is broadcast as 8-byte siphashes (internal transport only; dup
# DETECTION is exact window-string equality in both engines)
_WIN_BROADCAST_LIMIT = 2_000_000


def _doc_windows(t: pa.Table, k: int):
    """(doc_id, n_windows, windows) per doc: whitespace-tokenized k-token
    sliding windows rebuilt as ' '-joined strings. Tokenization is the
    explicit class [ \\t\\r\\n]+ after trim — RE2 on the Ray side and in the
    DuckDB oracle, so the two agree byte-for-byte (memory: never lean on \\s
    parity). Vectorized: one Arrow split per batch, one numpy object-array
    join pass per k."""
    import numpy as np_

    trimmed = pc.utf8_trim(t["text"], " \t\r\n")
    toks = pc.split_pattern_regex(trimmed, "[ \t\r\n]+")
    lengths = toks.combine_chunks().value_lengths().to_numpy(zero_copy_only=False)
    flat = np_.asarray(toks.combine_chunks().flatten().to_pylist(), dtype=object)
    offs = np_.concatenate(([0], np_.cumsum(lengths)))
    doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
    out_doc, out_win, n_windows = [], [], np_.maximum(lengths - k + 1, 0)
    for d in range(t.num_rows):
        s, e = offs[d], offs[d + 1]
        n = e - s - k + 1
        if n <= 0:
            continue
        toks_d = flat[s:e]
        win = toks_d[:n].copy()
        for j in range(1, k):
            win = np_.char.add(np_.char.add(win.astype(str), " "), toks_d[j : j + n].astype(str))
        out_doc.append(np_.full(n, doc_ids[d]))
        out_win.append(win)
    if not out_doc:
        return (
            np_.empty(0, np_.int64),
            np_.empty(0, object),
            doc_ids,
            n_windows.astype(np_.int64),
        )
    return (
        np_.concatenate(out_doc),
        np_.concatenate(out_win),
        doc_ids,
        n_windows.astype(np_.int64),
    )


def substring_dup_fraction(
    sf_dir: str, k: int = _WIN_K, min_count: int = 2,
    broadcast_limit: int = _WIN_BROADCAST_LIMIT,
) -> Dataset:
    """Exact-substring dedup signal at k-token window granularity (the
    Dolma/Lee-et-al. staple, window-approximated): for every document, the
    fraction of its k-token sliding windows whose exact text occurs >=
    min_count times ACROSS the corpus. Emits (doc_id, n_windows,
    n_dup_windows, dup_fraction); docs shorter than k tokens have
    n_windows=0 and a NULL fraction.

    Scale shape: pass 1 counts windows with a per-batch DISTINCT partial
    (one row per distinct window per block) -> window-keyed groupby Sum;
    only windows clearing min_count — the duplicated vocabulary — are
    collected as 8-byte siphashes and broadcast once. Pass 2 re-derives
    each doc's windows locally (documents are row-per-doc, so no window
    ever crosses an exchange in this pass) and counts membership via
    searchsorted. The honest cost is pass 1's distinct-window exchange
    (~k x text bytes upper bound, block-distinct in practice); true suffix
    arrays beat it asymptotically but need a global index this engine
    would build as a side artifact, not a streaming pass."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def count_part(t: pa.Table) -> pa.Table:
        import numpy as np_

        _, wins, _, _ = _doc_windows(t, k)
        uniq, counts = np_.unique(wins.astype(str), return_counts=True) if len(wins) else (
            np_.empty(0, object), np_.empty(0, np_.int64))
        return pa.table(
            {"w": pa.array(uniq.tolist(), pa.string()),
             "cnt": pa.array(counts.astype("int64"), pa.int64())}
        )

    counts = (
        ds.map_batches(count_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby("w")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def dup_hashes(t: pa.Table) -> pa.Table:
        from pandas.util import hash_array

        sub = t.filter(pc.greater_equal(t["cnt"], min_count))
        h = hash_array(sub["w"].to_numpy(zero_copy_only=False), categorize=False)
        return pa.table({"h": pa.array(h.astype(np.uint64), pa.uint64())})

    dups = counts.map_batches(
        dup_hashes, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()
    if dups.count() > broadcast_limit:
        raise ValueError(
            f"substring_dup_fraction: duplicated-window vocabulary exceeds "
            f"broadcast_limit={broadcast_limit}; raise the limit or pre-filter "
            "(the paragraph_dedup shuffle-path pattern applies if this trips in practice)"
        )
    harr = np.sort(
        np.concatenate(
            [b["h"].to_numpy() for b in dups.iter_batches(batch_format="pyarrow", batch_size=None)]
            or [np.empty(0, np.uint64)]
        )
    )
    href = ray.put(harr)

    def score(t: pa.Table) -> pa.Table:
        from pandas.util import hash_array

        from ..util import cached_get

        win_doc, wins, doc_ids, n_windows = _doc_windows(t, k)
        arr = cached_get(href)
        if len(wins) and arr.size:
            h = hash_array(wins.astype(object), categorize=False).astype(np.uint64)
            pos = np.searchsorted(arr, h)
            dup = (pos < arr.size) & (arr[np.minimum(pos, arr.size - 1)] == h)
        else:
            dup = np.zeros(len(wins), bool)
        n_dup = np.zeros(t.num_rows, np.int64)
        if len(wins):
            # win_doc holds the actual doc_id per window; map back to row idx
            order = {int(d): i for i, d in enumerate(t["doc_id"].to_numpy(zero_copy_only=False))}
            idx = np.fromiter((order[int(d)] for d in win_doc), np.int64, len(win_doc))
            np.add.at(n_dup, idx, dup.astype(np.int64))
        frac = np.where(n_windows > 0, n_dup / np.maximum(n_windows, 1), np.nan)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_windows": pa.array(n_windows, pa.int64()),
                "n_dup_windows": pa.array(n_dup, pa.int64()),
                "dup_fraction": pa.array(
                    [None if n == 0 else round(float(f), 6) for n, f in zip(n_windows, frac)],
                    pa.float64(),
                ),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def dedup_keep_best(sf_dir: str, threshold: float = 0.7) -> "pa.Table":
    """Representative selection for near-dup groups — the policy layer on
    top of MinHash-LSH clustering: within every dup group keep the doc with
    the MOST alphanumeric content (n_alnum, the quality_scores component;
    integer, so the ranking never hinges on float rounding), doc_id
    ascending as the tie-break. Emits (dup_group, doc_id, n_alnum, kept)
    for every clustered doc.

    Scale shape: the group table is dup-vocabulary-bounded (it exists only
    for docs with a verified near-dup), so it broadcasts; ONE streaming
    pass over documents scores just the grouped docs (membership via
    searchsorted on a broadcast id array) and returns a group-sized result;
    the argmax-per-group fold runs on that bounded table. Document text
    never enters an exchange."""
    import re as _re

    from ..util import cached_get
    from .dedup import minhash_dup_groups

    groups = minhash_dup_groups(sf_dir, threshold=threshold)
    # dup-vocabulary-bounded collect (same budget argument as the canonical
    # map): one row per clustered doc
    grp_rows = groups.take_all()
    if not grp_rows:
        return pa.schema(
            [("dup_group", pa.int64()), ("doc_id", pa.int64()),
             ("n_alnum", pa.int64()), ("kept", pa.bool_())]
        ).empty_table()
    gmap = {int(r["doc_id"]): int(r["dup_group"]) for r in grp_rows}
    ids = np.sort(np.fromiter(gmap, np.int64, len(gmap)))
    ids_ref = ray.put(ids)

    word_re = _re.compile(r"[A-Za-z0-9]+")

    def score_members(t: pa.Table) -> pa.Table:
        arr = cached_get(ids_ref)
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(arr, doc)
        hit = (pos < arr.size) & (arr[np.minimum(pos, arr.size - 1)] == doc)
        sub = t.filter(pa.array(hit))
        texts = sub["text"].to_pylist()
        n_alnum = pa.array(
            [sum(len(w) for w in word_re.findall(x)) for x in texts], pa.int64()
        )
        return pa.table({"doc_id": sub["doc_id"], "n_alnum": n_alnum})

    scored = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        score_members, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    rows = scored.take_all()  # group-sized, bounded with the group table
    rows.sort(key=lambda r: (gmap[int(r["doc_id"])], -int(r["n_alnum"]), int(r["doc_id"])))
    out_g, out_d, out_n, out_k = [], [], [], []
    prev = None
    for r in rows:
        g = gmap[int(r["doc_id"])]
        out_g.append(g)
        out_d.append(int(r["doc_id"]))
        out_n.append(int(r["n_alnum"]))
        out_k.append(g != prev)
        prev = g
    return pa.table(
        {
            "dup_group": pa.array(out_g, pa.int64()),
            "doc_id": pa.array(out_d, pa.int64()),
            "n_alnum": pa.array(out_n, pa.int64()),
            "kept": pa.array(out_k, pa.bool_()),
        }
    )


_DSIR_VOCAB = 1000
_DSIR_ROUND = 4


def _lower_bigrams(t: pa.Table):
    """(bigram_doc_idx, bigrams) per batch: lowercase [a-z0-9]+ word bigrams
    as 'w1 w2' strings. polars extract_all does the vectorized tokenize; the
    window join reuses the numpy offsets kernel."""
    from ..util import polars_safe

    pl = polars_safe()
    toks = (
        pl.from_arrow(t.select(["text"]))
        .select(pl.col("text").str.to_lowercase().str.extract_all(r"[a-z0-9]+"))
        .to_series()
    )
    lengths = toks.list.len().to_numpy().astype(np.int64)
    flat = np.asarray(toks.explode().to_list(), dtype=object) if int(lengths.sum()) else np.empty(0, object)
    offs = np.concatenate(([0], np.cumsum(lengths)))
    out_idx, out_bg = [], []
    for d in range(t.num_rows):
        s, e = offs[d], offs[d + 1]
        n = e - s - 1
        if n <= 0:
            continue
        td = flat[s:e]
        bg = np.char.add(np.char.add(td[:n].astype(str), " "), td[1 : n + 1].astype(str))
        out_idx.append(np.full(n, d))
        out_bg.append(bg)
    if not out_idx:
        return np.empty(0, np.int64), np.empty(0, object)
    return np.concatenate(out_idx), np.concatenate(out_bg).astype(object)


def dsir_importance(
    sf_dir: str, vocab_size: int = _DSIR_VOCAB, ndigits: int = _DSIR_ROUND
) -> Dataset:
    """DSIR-style importance weights for data selection (hashed-ngram
    importance resampling, public method — Xie et al.): score every document
    by how much its bigram distribution resembles a TARGET slice (the
    deterministic doc_id % 100 == 7 stand-in shared with decontaminate_docs)
    relative to the whole corpus. importance = sum over the doc's
    vocab-restricted bigram occurrences of ln(p_target / p_corpus), Laplace
    +1 smoothing over the top-``vocab_size`` target bigrams (count DESC,
    bigram ASC tie-break — fully deterministic). Emits (doc_id, n_feat,
    importance); docs with zero vocab bigrams score 0.0.

    Scale shape (3 streaming passes, every exchange bounded): pass 1 counts
    TARGET bigrams only (the target slice is a small fraction by
    construction) via per-batch partial -> groupby Sum; the top-V vocabulary
    collects (V-bounded) and broadcasts. Pass 2 counts CORPUS occurrences of
    vocabulary bigrams only (membership searchsorted before the exchange —
    the exchange is V-bounded, never corpus-bigram-sized). The per-bigram
    log-ratio table folds on the driver (V rows) and broadcasts. Pass 3
    scores each doc locally. The literal-bigram vocabulary (vs DSIR's hash
    buckets) is what makes the DuckDB oracle byte-reproducible; a 100 TB
    deployment would raise vocab_size, not change the shape."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def target_partial(t: pa.Table) -> pa.Table:
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(doc % _PROBE_MOD == _PROBE_RESIDUE))
        _, bg = _lower_bigrams(t)
        uniq, counts = (np.unique(bg, return_counts=True) if len(bg)
                        else (np.empty(0, object), np.empty(0, np.int64)))
        return pa.table({"b": pa.array(uniq.tolist(), pa.string()),
                         "cnt": pa.array(counts.astype("int64"), pa.int64())})

    tcounts = (
        ds.map_batches(target_partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby("b")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .materialize()
    )
    # V-bounded driver fold: deterministic top-V by (count DESC, bigram ASC)
    rows = tcounts.take_all()
    rows.sort(key=lambda r: (-int(r["cnt"]), r["b"]))
    rows = rows[:vocab_size]
    vocab = np.array(sorted(r["b"] for r in rows), dtype=object)
    tgt_cnt = {r["b"]: int(r["cnt"]) for r in rows}
    vocab_ref = ray.put(vocab)

    def corpus_partial(t: pa.Table) -> pa.Table:
        from ..util import cached_get

        v = cached_get(vocab_ref)
        _, bg = _lower_bigrams(t)
        if len(bg) and v.size:
            pos = np.searchsorted(v, bg)
            hit = (pos < v.size) & (v[np.minimum(pos, v.size - 1)] == bg)
            bg = bg[hit]
        uniq, counts = (np.unique(bg, return_counts=True) if len(bg)
                        else (np.empty(0, object), np.empty(0, np.int64)))
        return pa.table({"b": pa.array(uniq.tolist(), pa.string()),
                         "cnt": pa.array(counts.astype("int64"), pa.int64())})

    ccounts = (
        ds.map_batches(corpus_partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby("b")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    crows = ccounts.take_all()  # V-bounded
    c_cnt = {r["b"]: int(r["cnt"]) for r in crows}
    v_n = len(vocab)
    tot_t = sum(tgt_cnt.values()) + v_n
    tot_c = sum(c_cnt.get(b, 0) for b in vocab) + v_n
    ratio = np.array(
        [
            np.log(((tgt_cnt.get(b, 0) + 1) / tot_t) / ((c_cnt.get(b, 0) + 1) / tot_c))
            for b in vocab
        ],
        np.float64,
    )
    ratio_ref = ray.put(ratio)

    def score(t: pa.Table) -> pa.Table:
        from ..util import cached_get

        v = cached_get(vocab_ref)
        lr = cached_get(ratio_ref)
        idx, bg = _lower_bigrams(t)
        n_feat = np.zeros(t.num_rows, np.int64)
        imp = np.zeros(t.num_rows, np.float64)
        if len(bg) and v.size:
            pos = np.searchsorted(v, bg)
            hit = (pos < v.size) & (v[np.minimum(pos, v.size - 1)] == bg)
            np.add.at(n_feat, idx[hit], 1)
            np.add.at(imp, idx[hit], lr[pos[hit]])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_feat": pa.array(n_feat, pa.int64()),
                "importance": pa.array(np.round(imp, ndigits), pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def lm_perplexity_scores(sf_dir: str, ndigits: int = 4) -> Dataset:
    """CCNet-style LM quality scoring with a deterministic stand-in model:
    train a char-bigram language model on the WHOLE corpus (one pass of
    mergeable count partials — the vocabulary is the bounded [a-z0-9 ]
    char-pair space, <= 37^2 rows, so the exchange is trivially small),
    then score every document by its mean negative log-likelihood under
    that model (Laplace +1). Low mean_nll = looks like the corpus; high =
    outlier/noise — the perplexity-filter signal CCNet computes with KenLM,
    reproduced here with a model simple enough for the DuckDB oracle to
    train identically. Emits (doc_id, n_bigrams, mean_nll); docs with <2
    usable chars get NULL mean_nll. Text is lowercased and every char
    outside [a-z0-9] maps to a single space (runs collapsed) — the explicit
    normalization both engines share."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def _norm_chars(t: pa.Table):
        x = pc.utf8_lower(t["text"])
        x = pc.replace_substring_regex(x, pattern="[^a-z0-9]+", replacement=" ")
        return pc.utf8_trim(x, " ")

    def count_part(t: pa.Table) -> pa.Table:
        norm = _norm_chars(t).to_pylist()
        from collections import Counter

        c: Counter = Counter()
        for x in norm:
            c.update(x[i : i + 2] for i in range(len(x) - 1))
        if not c:
            return pa.table({"bg": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        ks = list(c)
        return pa.table({"bg": pa.array(ks, pa.string()),
                         "cnt": pa.array([c[k] for k in ks], pa.int64())})

    counts = (
        ds.map_batches(count_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby("bg")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    rows = counts.take_all()  # bounded: <= 37^2 char pairs
    total = sum(int(r["cnt"]) for r in rows)
    vsize = 37 * 37
    logp = {r["bg"]: np.log((int(r["cnt"]) + 1) / (total + vsize)) for r in rows}
    unseen = float(np.log(1.0 / (total + vsize)))
    lp_ref = ray.put((logp, unseen))

    def score(t: pa.Table) -> pa.Table:
        from ..util import cached_get

        lp, uns = cached_get(lp_ref)
        norm = _norm_chars(t).to_pylist()
        n_bg = np.zeros(t.num_rows, np.int64)
        nll = np.zeros(t.num_rows, np.float64)
        for i, x in enumerate(norm):
            n = len(x) - 1
            if n <= 0:
                continue
            n_bg[i] = n
            nll[i] = -sum(lp.get(x[j : j + 2], uns) for j in range(n))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bigrams": pa.array(n_bg, pa.int64()),
                "mean_nll": pa.array(
                    [None if n == 0 else round(float(v / n), ndigits)
                     for n, v in zip(n_bg, nll)],
                    pa.float64(),
                ),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def split_leakage_audit(sf_dir: str, threshold: float = 0.7) -> "pa.Table":
    """Eval-leakage audit: verified near-dup pairs whose members landed in
    DIFFERENT splits of the content-hash train/val/test assignment
    (ops/textstats.split_assign). Exact dups can't straddle splits (same
    md5), but NEAR dups can — exactly the leakage a pretraining pipeline
    must catch before trusting held-out numbers. Emits (doc_a, doc_b,
    split_a, split_b) for straddling pairs, doc_a < doc_b.

    Scale shape: the verified pair table is dup-vocabulary-bounded
    (collect + broadcast member ids); one streaming pass computes splits
    for MEMBER docs only; the pair join happens on the bounded table."""
    import hashlib

    from ..util import cached_get
    from .dedup import _verified_edges

    edges = _verified_edges(sf_dir, threshold, shingle_k=3, num_perm=64, bands=32)
    pair_rows = edges.take_all()  # bounded with the dup vocabulary
    if not pair_rows:
        return pa.schema(
            [("doc_a", pa.int64()), ("doc_b", pa.int64()),
             ("split_a", pa.string()), ("split_b", pa.string())]
        ).empty_table()
    member = np.sort(
        np.unique([int(r[k]) for r in pair_rows for k in ("a", "b")])
    ).astype(np.int64)
    mref = ray.put(member)

    def member_splits(t: pa.Table) -> pa.Table:
        arr = cached_get(mref)
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(arr, doc)
        hit = (pos < arr.size) & (arr[np.minimum(pos, arr.size - 1)] == doc)
        sub = t.filter(pa.array(hit))
        split = [
            "val" if h == "e" else "test" if h == "f" else "train"
            for h in (
                hashlib.md5(x.encode("utf-8")).hexdigest()[0]
                for x in sub["text"].to_pylist()
            )
        ]
        return pa.table({"doc_id": sub["doc_id"], "split": pa.array(split, pa.string())})

    srows = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(member_splits, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .take_all()
    )
    smap = {int(r["doc_id"]): r["split"] for r in srows}
    out = []
    for r in pair_rows:
        a, b = sorted((int(r["a"]), int(r["b"])))
        sa, sb = smap[a], smap[b]
        if sa != sb:
            out.append((a, b, sa, sb))
    out.sort()
    return pa.table(
        {
            "doc_a": pa.array([o[0] for o in out], pa.int64()),
            "doc_b": pa.array([o[1] for o in out], pa.int64()),
            "split_a": pa.array([o[2] for o in out], pa.string()),
            "split_b": pa.array([o[3] for o in out], pa.string()),
        }
    )


def corpus_datasheet(sf_dir: str) -> pa.Table:
    """One-row corpus datasheet — the summary card a curation run publishes
    next to its output (docs, exact token/char totals, language and source
    cardinalities, distinct-text count as the exact-dup headline). Returns
    a single-row pa.Table; every number is an exact integer.

    Scale shape: one vectorized scan emits light rows (16 B digest + two
    ints + two tiny dictionary strings); the additive totals fold as
    mergeable partials, the three distinct counts run as DISTRIBUTED
    groupby().count()s (the count of groups never lands on the driver as
    rows — only the final scalar does). Digest-distinct equals
    text-distinct by the exact_dedup_docs md5 contract."""
    import hashlib

    from ray.data.aggregate import Count, Sum

    ds = _docs(sf_dir, ["text", "lang", "source"])

    def light(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        dig = [hashlib.md5(x.encode("utf-8")).hexdigest() for x in texts]
        return pa.table(
            {
                "digest": pa.array(dig, pa.string()),
                "lang": t["lang"],
                "source": t["source"],
                "n_tokens": pc.count_substring_regex(t["text"], "[A-Za-z0-9]+").cast(pa.int64()),
                "n_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
            }
        )

    lt = ds.map_batches(
        light, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()  # tiny rows, read 4x (totals + three distinct counts)

    tot = lt.aggregate(
        Count(alias_name="n_docs"),
        Sum("n_tokens", alias_name="n_tokens"),
        Sum("n_chars", alias_name="n_chars"),
    )
    n_langs = lt.groupby("lang").count().count()
    n_sources = lt.groupby("source").count().count()
    n_distinct = lt.groupby("digest").count().count()
    return pa.table(
        {
            "n_docs": pa.array([int(tot["n_docs"])], pa.int64()),
            "n_tokens": pa.array([int(tot["n_tokens"])], pa.int64()),
            "n_chars": pa.array([int(tot["n_chars"])], pa.int64()),
            "n_langs": pa.array([int(n_langs)], pa.int64()),
            "n_sources": pa.array([int(n_sources)], pa.int64()),
            "n_distinct_texts": pa.array([int(n_distinct)], pa.int64()),
        }
    )
