"""Deduplication suite over the ``documents`` table (task brief first-class
components): exact hash dedup, MinHash-LSH near-dup, SimHash, n-gram
Jaccard, and embedding-cosine near-dup (the last over ``embeddings``).

Every operator here is DRIVER-LIGHT by construction (the round-1 versions
pulled candidate pairs + texts to the driver; the round-2 shapes verify
inside the shuffle, mirroring stages/canon.py):

  exact    — content-hash column in map_batches -> groupby(hash) -> min id
  minhash  — shingle->minhash->band explode (rows carry the doc's 64-bit
             shingle-hash set) -> groupby(band) -> EXACT jaccard verify
             inside map_groups -> groupby(pair) dedup -> the driver sees
             only verified edges (tiny) for the union-find
  simhash  — 64-bit md5-vote SimHash in map_batches; near-dup pairs via
             16-bit chunk-key groupby (pigeonhole: hamming<=3 over 4 chunks
             guarantees one identical chunk) -> pair dedup groupby
  ngram    — word-bigram jaccard pairs: same LSH machinery at a lower
             threshold with 1-row bands for ~perfect recall
  cosine   — multi-band random-hyperplane LSH buckets -> within-bucket
             exact cosine >= tau -> pair dedup; one streaming execution

MinHash/SimHash hash functions are md5-based so the DuckDB oracle
(__ray_entry__.oracle_sql) can compute byte-identical values; the LSH band
configs are sized for ~1.0 recall at their thresholds (miss probability
<= 1e-8), so the outputs equal the exact-all-pairs oracle on real data.
"""

from __future__ import annotations

import hashlib
import logging
import re
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data import Dataset

from ..stages.canon import _hash_params, _minhash_sig_exact

logger = logging.getLogger(__name__)

_WORD_RE = re.compile(r"[A-Za-z0-9]+")


def _docs(sf_dir: str, columns: list[str] | None = None) -> Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# ---------------------------------------------------------------------------
# exact dedup


def exact_dedup_docs(sf_dir: str) -> Dataset:
    """Exact dedup by text content: keep min(doc_id) per distinct text.
    Hash-partition groupby on a content-hash column (never ships full text
    through the driver); deterministic representative (min id, not
    first-seen, so results are order-independent)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def add_hash(t: pa.Table) -> pa.Table:
        hashes = [hashlib.md5(x.encode("utf-8")).hexdigest() for x in t["text"].to_pylist()]
        return t.append_column("text_hash", pa.array(hashes, pa.string()))

    def keep_min(t: pa.Table) -> pa.Table:
        i = pc.index(pc.equal(t["doc_id"], pc.min(t["doc_id"])), True).as_py()
        return t.slice(i, 1).select(["doc_id", "text_hash"])

    return (
        ds.map_batches(add_hash, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby("text_hash")
        .map_groups(keep_min, batch_format="pyarrow")
    )


def distinct_text_count(sf_dir: str) -> "pa.Table":
    """COUNT(DISTINCT text) via hash groupby (SQL-matchable scalar)."""
    deduped = exact_dedup_docs(sf_dir)
    return pa.table({"n_distinct": pa.array([deduped.count()], pa.int64())})


# ---------------------------------------------------------------------------
# shared shingle machinery (word n-grams, md5-hashed so the oracle matches)


def _token_shingles(text: str, k: int = 3) -> list[str]:
    """Word k-gram shingle STRINGS (lowercased alnum tokens joined by a
    space); texts shorter than k tokens shingle as the whole token string.
    Mirrored exactly by the DuckDB oracle's list comprehension."""
    toks = [w.lower() for w in _WORD_RE.findall(text)]
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def _shingle_hash64(shingles: list[str], cache: dict[str, int]) -> np.ndarray:
    """Distinct 64-bit shingle hashes (first 8 md5 bytes, big-endian hex —
    identical to DuckDB ('0x' || substr(md5(s),1,16))::UBIGINT). Exact
    jaccard over these sets equals string-set jaccard up to 64-bit collision
    (~1e-12 at corpus scale)."""
    out = set()
    get = cache.get
    for s in shingles:
        h = get(s)
        if h is None:
            h = int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")
            cache[s] = h
        out.add(h)
    return np.fromiter(out, dtype=np.uint64, count=len(out))


class _ShingleBands:
    """Stateful map_batches stage: doc -> one row per LSH band, carrying the
    doc's shingle-hash set so verification happens INSIDE the band groupby
    (never on the driver). Band key packs (band_id, band_hash) into int64."""

    def __init__(self, num_perm: int, bands: int, shingle_k: int):
        assert num_perm % bands == 0
        self.rows = num_perm // bands
        self.bands = bands
        self.k = shingle_k
        self.a, self.b = _hash_params(num_perm)
        self.cache: dict[str, int] = {}  # actor-lifetime shingle-hash memo

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        out_key: list[int] = []
        out_id: list[int] = []
        out_sh: list[list[int]] = []
        for did, text in zip(ids, texts):
            sh = _shingle_hash64(_token_shingles(text, self.k), self.cache)
            if sh.size == 0:
                continue
            # minhash base = low 32 bits (exact Mersenne-61 universal hashing
            # needs x < 2^32); the carried verify set keeps all 64 bits
            sig = _minhash_sig_exact(sh & np.uint64(0xFFFFFFFF), self.a, self.b)
            sh_list = sh.astype(np.int64).tolist()
            for bi in range(self.bands):
                h = zlib.crc32(sig[bi * self.rows : (bi + 1) * self.rows].tobytes())
                out_key.append((bi << 32) | h)
                out_id.append(did)
                out_sh.append(sh_list)
        return pa.table(
            {
                "band_key": pa.array(out_key, pa.int64()),
                "doc_id": pa.array(out_id, pa.int64()),
                "sh": pa.array(out_sh, pa.list_(pa.int64())),
            }
        )


def _verify_pairs_group(threshold: float, max_group: int):
    """map_groups over one LSH bucket: exact jaccard on the carried shingle
    sets; emits only VERIFIED pairs (a < b, with intersection/union sizes as
    exact integers — no float columns to drift against the oracle)."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        sets = [set(x) for x in t["sh"].to_pylist()]
        order = np.argsort(ids)
        if len(order) > max_group:
            logger.warning("LSH bucket capped: %d docs > max_group=%d", len(order), max_group)
            order = order[:max_group]
        out_a, out_b, out_i, out_u = [], [], [], []
        for ii in range(len(order)):
            for jj in range(ii + 1, len(order)):
                x, y = order[ii], order[jj]
                sa, sb = sets[x], sets[y]
                inter = len(sa & sb)
                if not inter:
                    continue
                uni = len(sa) + len(sb) - inter
                if inter / uni >= threshold:
                    out_a.append(ids[x])
                    out_b.append(ids[y])
                    out_i.append(inter)
                    out_u.append(uni)
        return pa.table(
            {
                "a": pa.array(out_a, pa.int64()),
                "b": pa.array(out_b, pa.int64()),
                "inter": pa.array(out_i, pa.int64()),
                "uni": pa.array(out_u, pa.int64()),
            }
        )

    return fn


def _verified_edges(
    sf_dir: str,
    threshold: float,
    shingle_k: int,
    num_perm: int,
    bands: int,
    max_group: int = 512,
) -> Dataset:
    """Distributed LSH candidate generation + in-shuffle exact verification;
    returns the deduplicated verified edge Dataset (a, b, inter, uni)."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    band_rows = ds.map_batches(
        _ShingleBands,
        fn_constructor_args=(num_perm, bands, shingle_k),
        batch_format="pyarrow",
        batch_size=None,
        concurrency=(1, 4),
        zero_copy_batch=True,
    )
    verified = band_rows.groupby("band_key").map_groups(
        _verify_pairs_group(threshold, max_group), batch_format="pyarrow"
    )
    # the same pair verifies in many bands: one small pair-key groupby dedups
    return verified.groupby(["a", "b"]).map_groups(
        lambda t: t.slice(0, 1), batch_format="pyarrow"
    )


def minhash_dup_groups(sf_dir: str, threshold: float = 0.7) -> "pa.Table":
    """MinHash-LSH near-dup clusters: (doc_id, dup_group=min doc_id of the
    connected component) for docs with an exact-jaccard >= threshold
    neighbor. 64 perms x 32 bands (2 rows) -> candidate recall at j=0.7 is
    1-(1-0.7^2)^32 ~ 1-4e-10, and false positives die in the exact verify,
    so the output equals the all-pairs oracle. Only verified edges (tiny)
    reach the driver's union-find — candidate pairs and texts never do."""
    edges_ds = _verified_edges(sf_dir, threshold, shingle_k=3, num_perm=64, bands=32)
    edges = sorted((r["a"], r["b"]) for r in edges_ds.take_all())
    if not edges:
        return pa.table({"doc_id": pa.array([], pa.int64()), "dup_group": pa.array([], pa.int64())})
    # integer union-find, NUMERIC-min representative (the string union-find in
    # stages/canon.py is lexicographic — "450" < "5" — which is right for
    # surface norms but wrong for int doc ids / the SQL oracle's MIN)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = parent.setdefault(x, x)
        while r != parent[r]:
            parent[r] = parent[parent[r]]
            r = parent[r]
        parent[x] = r
        return r

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    groups: dict[int, list[int]] = {}
    for x in parent:
        groups.setdefault(find(x), []).append(x)
    out_id, out_grp = [], []
    for root in sorted(groups):
        for d in sorted(groups[root]):
            out_id.append(d)
            out_grp.append(root)
    return pa.table(
        {"doc_id": pa.array(out_id, pa.int64()), "dup_group": pa.array(out_grp, pa.int64())}
    )


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.5) -> Dataset:
    """Exact word-BIGRAM jaccard near-dup pairs (distinct from the 3-gram
    minhash clusters above: different shingling, pair-level output with the
    exact intersection/union sizes). LSH bands are 1-row x 128 so recall at
    j=0.5 is 1-0.5^128 (exhaustive in practice); exact verify in-shuffle."""
    return _verified_edges(sf_dir, threshold, shingle_k=2, num_perm=128, bands=128).rename_columns(
        ["doc_a", "doc_b", "inter", "uni"]
    )


# ---------------------------------------------------------------------------
# SimHash


class SimHashStage:
    """64-bit SimHash over md5 token hashes, occurrence-weighted, emitted as
    a 16-hex-char string (DuckDB computes the identical value from
    ('0x'||substr(md5(tok),1,16))::UBIGINT bit votes). Stateful: the
    token-hash memo lives for the actor."""

    def __init__(self):
        self.word = _WORD_RE
        self.cache: dict[str, int] = {}
        self.shifts = np.arange(64, dtype=np.uint64)

    def _tok_hashes(self, toks: list[str]) -> np.ndarray:
        get = self.cache.get
        out = np.empty(len(toks), dtype=np.uint64)
        for i, w in enumerate(toks):
            h = get(w)
            if h is None:
                h = int.from_bytes(hashlib.md5(w.encode("utf-8")).digest()[:8], "big")
                self.cache[w] = h
            out[i] = h
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        out = []
        for x in texts:
            toks = self.word.findall(x.lower())
            if not toks:
                out.append("0" * 16)
                continue
            hs = self._tok_hashes(toks)
            bits = ((hs[:, None] >> self.shifts[None, :]) & np.uint64(1)).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            v = np.uint64(0)
            sel = np.flatnonzero(votes > 0)
            for i in sel:
                v |= np.uint64(1) << np.uint64(i)
            out.append(format(int(v), "016x"))
        return pa.table(
            {"doc_id": t["doc_id"], "simhash": pa.array(out, pa.string())}
        )


def simhash_docs(sf_dir: str) -> Dataset:
    ds = _docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(SimHashStage, batch_format="pyarrow", batch_size=None, concurrency=(1, 4),
                          zero_copy_batch=True)


def _simhash_explode(t: pa.Table) -> pa.Table:
    """(doc_id, simhash) -> 4 rows keyed by (chunk_idx<<16 | 16-bit chunk).
    Pigeonhole guarantee: two hashes within hamming distance 3 differ in at
    most 3 of the 4 chunks, so they share at least one chunk key exactly —
    the blocking is lossless, not approximate."""
    hexes = t["simhash"].to_pylist()
    ids = t["doc_id"].to_pylist()
    v = np.array([int(h, 16) for h in hexes], dtype=np.uint64)
    keys, out_ids, out_sim = [], [], []
    for c in range(4):
        chunk = ((v >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64)
        keys.extend(((c << 16) | x for x in chunk.tolist()))
        out_ids.extend(ids)
        out_sim.extend(v.astype(np.int64).tolist())  # two's-complement carry
    return pa.table(
        {
            "chunk_key": pa.array(keys, pa.int64()),
            "doc_id": pa.array(out_ids, pa.int64()),
            "sim": pa.array(out_sim, pa.int64()),
        }
    )


def _simhash_pairs_group(max_hamming: int, max_group: int):
    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        sims = np.asarray(t["sim"].to_pylist(), dtype=np.int64).view(np.uint64)
        order = np.argsort(ids)
        if len(order) > max_group:
            logger.warning("simhash chunk bucket capped: %d > %d", len(order), max_group)
            order = order[:max_group]
        out_a, out_b, out_d = [], [], []
        for ii in range(len(order)):
            for jj in range(ii + 1, len(order)):
                x, y = order[ii], order[jj]
                if ids[x] == ids[y]:
                    continue
                d = int(bin(int(sims[x] ^ sims[y])).count("1"))
                if d <= max_hamming:
                    out_a.append(min(ids[x], ids[y]))
                    out_b.append(max(ids[x], ids[y]))
                    out_d.append(d)
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "hamming": pa.array(out_d, pa.int64()),
            }
        )

    return fn


def simhash_dup_pairs(sf_dir: str, max_hamming: int = 3, max_group: int = 512) -> Dataset:
    """Near-dup pairs by SimHash hamming distance <= max_hamming, distributed:
    16-bit chunk explode -> chunk-key groupby -> in-group hamming -> pair
    dedup groupby. The signature table never materializes on the driver."""
    sh = simhash_docs(sf_dir)
    exploded = sh.map_batches(
        _simhash_explode, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    pairs = exploded.groupby("chunk_key").map_groups(
        _simhash_pairs_group(max_hamming, max_group), batch_format="pyarrow"
    )
    # a pair can match in up to 4 chunks: dedup on the pair key
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda t: t.slice(0, 1), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup


class _HyperplaneBands:
    """Multi-band random-hyperplane LSH: n_bands bands of band_bits sign
    bits. Collision prob per bit at cosine 0.95 is 1-acos(.95)/pi ~ 0.899,
    so recall = 1-(1-0.899^8)^24 ~ 1-2e-6 — near-exhaustive at the 0.95
    threshold while buckets stay tiny. Planes are regenerated from a fixed
    seed per actor (a few KB; deterministic across processes).

    Scale note: rows carry the normalized vector into the band shuffle
    (n_bands x vector amplification). At 100 TB drop n_bands / use a
    vec_id-only first pass + hash-join fetch; for the near-dup thresholds
    this engine targets, the carried-vector form is the latency winner."""

    def __init__(self, dim: int, band_bits: int = 8, n_bands: int = 24, seed: int = 13):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, band_bits * n_bands))
        self.band_bits = band_bits
        self.n_bands = n_bands

    def __call__(self, t: pa.Table) -> pa.Table:
        emb = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        emb = np.divide(emb, norms, where=norms > 0)
        signs = (emb @ self.planes) > 0  # (n, n_bands*band_bits)
        n = emb.shape[0]
        weights = 1 << np.arange(self.band_bits)
        out_key, out_id, out_vec = [], [], []
        ids = t["vec_id"].to_pylist()
        vec_lists = emb.tolist()
        for band in range(self.n_bands):
            sl = signs[:, band * self.band_bits : (band + 1) * self.band_bits]
            key = (sl @ weights) + (band << self.band_bits)
            out_key.extend(key.tolist())
            out_id.extend(ids)
            out_vec.extend(vec_lists)
        return pa.table(
            {
                "band_key": pa.array(out_key, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "vec": pa.array(out_vec, pa.list_(pa.float64())),
            }
        )


def _cosine_pairs_group(threshold: float, max_group: int):
    def fn(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        order = np.argsort(ids)
        if len(order) > max_group:
            logger.warning("hyperplane bucket capped: %d > %d", len(order), max_group)
            order = order[:max_group]
        ids = ids[order]
        vecs = np.asarray(t["vec"].to_pylist(), dtype=np.float64)[order]
        sims = vecs @ vecs.T
        ii, jj = np.where(np.triu(sims >= threshold, k=1))
        return pa.table(
            {
                "vec_a": pa.array(ids[ii], pa.int64()),
                "vec_b": pa.array(ids[jj], pa.int64()),
                "cosine": pa.array(np.round(sims[ii, jj], 6), pa.float64()),
            }
        )

    return fn


def embedding_near_dups(
    sf_dir: str, threshold: float = 0.95, band_bits: int = 8, n_bands: int = 24,
    max_group: int = 4096,
) -> "pa.Table":
    """Near-dup pairs by embedding cosine >= threshold: multi-band
    hyperplane LSH buckets -> exact within-bucket cosine -> pair-key dedup.
    ONE streaming execution (the round-1 version executed the pipeline twice
    and used a single 12-bit band with unmeasured recall; recall of this
    config is ~1-2e-6 at tau=0.95 and unit-gated with constructed near-dup
    pairs in tests/test_dedup_suite.py)."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    dim = len(ds.take(1)[0]["embedding"])
    bucketed = ds.map_batches(
        _HyperplaneBands,
        fn_constructor_args=(dim, band_bits, n_bands),
        batch_format="pyarrow",
        batch_size=None,
        concurrency=(1, 4),
        zero_copy_batch=True,
    )
    pairs = bucketed.groupby("band_key").map_groups(
        _cosine_pairs_group(threshold, max_group), batch_format="pyarrow"
    )
    deduped = pairs.groupby(["vec_a", "vec_b"]).map_groups(
        lambda t: t.slice(0, 1), batch_format="pyarrow"
    )
    # verified near-dup pairs are tiny by construction: collect into an Arrow
    # table with an EXPLICIT schema (an empty Dataset loses its schema, which
    # would fail the driver's schema compare on fixtures with no near-dups)
    return pa.Table.from_pylist(
        deduped.take_all(),
        schema=pa.schema(
            [("vec_a", pa.int64()), ("vec_b", pa.int64()), ("cosine", pa.float64())]
        ),
    )
