"""Rank + sketch operators (ray_guide.md "mergeable sketch" pattern):
top-k per group, grouped median, HyperLogLog approximate distinct count.

HLL is the canonical mergeable sketch: one serialized register array per
batch, merged in a tiny second stage — at 100 TB the exchange carries
2^p-byte sketches, never values."""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data import Dataset


def _events(sf_dir: str, columns: list[str] | None = None) -> Dataset:
    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def topk_events_per_user(sf_dir: str, k: int = 3) -> Dataset:
    """Top-k events by value per user (rank within group): coarse user-hash
    partitions, then ONE vectorized sort + cumcount per partition (the
    per-user map_groups form paid one Python call per user); SQL oracle via
    row_number() OVER. Per-batch partial top-k before the exchange bounds
    the shuffled rows at k per user per batch."""
    ds = _events(sf_dir, ["event_id", "user_id", "value"])
    from .window import _user_partitioned

    def topk_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "value", "event_id"],
                          ascending=[True, False, True], kind="mergesort")
        g["rank"] = g.groupby("user_id").cumcount() + 1
        g = g[g["rank"] <= k]
        return g[["user_id", "event_id", "value", "rank"]]

    return _user_partitioned(ds).groupby("__part").map_groups(
        topk_partition, batch_format="pandas"
    )


def median_value_by_type(sf_dir: str) -> Dataset:
    """Exact grouped median (interpolated for even counts, matching both
    pandas and DuckDB MEDIAN): per-group pandas over a groupby."""
    ds = _events(sf_dir, ["event_type", "value"])

    def med(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "median_value": [round(float(g["value"].median()), 6)],
            }
        )

    return ds.groupby("event_type").map_groups(med, batch_format="pandas")


# --- HyperLogLog ------------------------------------------------------------

_HLL_P = 12  # 4096 registers; rel. error ~ 1.04/sqrt(4096) ~ 1.6%


def _mix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer: deterministic, well-mixed 64-bit hash
    (crc32 is biased on sequential integer keys — measured +13% HLL
    estimates; a strong avalanche finalizer fixes the bias without a
    per-value Python hashing loop)."""
    x = x.astype(np.uint64, copy=True)
    x += np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _hll_registers(values: np.ndarray, p: int = _HLL_P) -> np.ndarray:
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = _mix64(np.asarray(values, dtype=np.int64).view(np.uint64))
    idx = (h & np.uint64(m - 1)).astype(np.int64)
    w = h >> np.uint64(p)
    # rank = trailing zeros + 1, capped at 64-p (w has 64-p significant bits,
    # so the isolated lowest set bit is < 2^52 — exact in float64 log2)
    low = (w & (~w + np.uint64(1))).astype(np.float64)
    rank = np.where(
        w == 0,
        np.uint8(64 - p),
        (np.log2(np.maximum(low, 1.0)) + 1).astype(np.uint8),
    )
    np.maximum.at(regs, idx, rank)
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    m = float(len(regs))
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting small-range correction
    return float(est)


def approx_distinct_users(sf_dir: str) -> pa.Table:
    """Approximate COUNT(DISTINCT user_id) via HLL: per-batch sketches ->
    driver max-merge (registers are element-wise max-mergeable)."""
    ds = _events(sf_dir, ["user_id"])

    def sketch(t: pa.Table) -> pa.Table:
        vals = t["user_id"].to_numpy(zero_copy_only=False)
        regs = _hll_registers(vals)
        return pa.table({"registers": pa.array([regs.tobytes()], pa.binary())})

    merged = np.zeros(1 << _HLL_P, dtype=np.uint8)
    for b in ds.map_batches(
        sketch, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        for blob in b["registers"].to_pylist():
            np.maximum(merged, np.frombuffer(blob, dtype=np.uint8), out=merged)
    return pa.table({"approx_distinct": pa.array([int(round(_hll_estimate(merged)))], pa.int64())})


# -- CMS-guided exact heavy hitters ------------------------------------------
# Count-min sketch as a PRUNING filter, not as the answer: pass 1 merges one
# additive d x w int64 sketch per block (fixed 512 KB regardless of corpus
# size); pass 2 broadcasts the merged sketch and lets only rows whose CMS
# estimate clears the threshold enter the exact groupby. CMS never
# underestimates, so no true heavy hitter is pruned — the output is EXACT
# (SQL-oracled via HAVING COUNT(*) >= T) while the final exchange carries
# only candidate users' partial counts instead of the full key space.
_CMS_D, _CMS_W = 4, 1 << 14
_CMS_SEEDS = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5],
    dtype=np.uint64,
)


def _cms_rows(vals: np.ndarray) -> np.ndarray:
    """(d, n) bucket indices for int64 keys under d seeded mix64 hashes."""
    v = vals.astype(np.uint64)
    return np.stack(
        [_mix64(v ^ s) % np.uint64(_CMS_W) for s in _CMS_SEEDS]
    ).astype(np.int64)


def heavy_hitter_users(sf_dir: str, threshold: int = 75) -> Dataset:
    """Users with >= ``threshold`` events, with EXACT counts."""
    import ray
    from ray.data.aggregate import Sum

    ds = _events(sf_dir, ["user_id"])

    def sketch(t: pa.Table) -> pa.Table:
        vals = t["user_id"].to_numpy(zero_copy_only=False)
        rows = _cms_rows(vals)
        m = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
        for r in range(_CMS_D):
            m[r] = np.bincount(rows[r], minlength=_CMS_W)
        return pa.table({"cms": pa.array([m.tobytes()], pa.binary())})

    merged = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
    for b in ds.map_batches(
        sketch, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        for blob in b["cms"].to_pylist():
            merged += np.frombuffer(blob, dtype=np.int64).reshape(_CMS_D, _CMS_W)
    cms_ref = ray.put(merged)

    def candidates(t: pa.Table) -> pa.Table:
        from ..util import cached_get

        m = cached_get(cms_ref)
        vals = t["user_id"].to_numpy(zero_copy_only=False)
        uniq, inv, cnt = np.unique(vals, return_inverse=True, return_counts=True)
        if not len(uniq):
            return pa.table(
                {"user_id": pa.array([], t["user_id"].type),
                 "n": pa.array([], pa.int64())}
            )
        rows = _cms_rows(uniq)
        est = m[np.arange(_CMS_D)[:, None], rows].min(axis=0)
        keep = est >= threshold  # no false negatives: est >= true count
        return pa.table(
            {
                "user_id": pa.array(uniq[keep], t["user_id"].type),
                "n": pa.array(cnt[keep], pa.int64()),
            }
        )

    def final_filter(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.greater_equal(t["n"], pa.scalar(threshold)))
        return t.set_column(
            t.column_names.index("n"), "n", pc.cast(t["n"], pa.int64())
        )

    return (
        ds.map_batches(
            candidates, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
        .groupby("user_id")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(final_filter, batch_format="pyarrow", batch_size=None)
    )


def p95_value_by_type(sf_dir: str, q: float = 0.95) -> Dataset:
    """Exact grouped 95th percentile (linear interpolation — pandas
    ``quantile`` and DuckDB ``quantile_cont`` agree bit-for-bit on the
    definition). Same shape as the grouped median: the groupby co-locates
    each type's values; a holistic quantile genuinely needs them together,
    and the group count is bounded by |event_type|, not by data size."""
    ds = _events(sf_dir, ["event_type", "value"])

    def pq(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "p95_value": [round(float(g["value"].quantile(q)), 6)],
            }
        )

    return ds.groupby("event_type").map_groups(pq, batch_format="pandas")


def corr_value_hour_by_type(sf_dir: str) -> Dataset:
    """Pearson correlation of (value, hour-of-day) per event type via
    ALGEBRAIC partials — each batch contributes (n, Σx, Σy, Σx², Σy², Σxy)
    per group, the global combine is six Sums, and the closed form runs on
    the |event_type|-bounded result. The mergeable-moments pattern is the
    100 TB story: no value ever crosses the exchange twice.

    Rounded to 4 digits: the raw-moments form and DuckDB's streaming corr
    differ by O(1e-7) cancellation noise near zero correlation; 1e-4 is
    comfortably coarser on both sides."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    ds = _events(sf_dir, ["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        x = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        y = pc.hour(t["ts"]).to_numpy(zero_copy_only=False).astype(np.float64)
        g = (
            pa.table(
                {
                    "event_type": t["event_type"],
                    "n": np.ones(len(x)),
                    "sx": x, "sy": y, "sxx": x * x, "syy": y * y, "sxy": x * y,
                }
            )
            .group_by("event_type", use_threads=False)
            .aggregate([(c, "sum") for c in ("n", "sx", "sy", "sxx", "syy", "sxy")])
        )
        return g.rename_columns(["event_type", "n", "sx", "sy", "sxx", "syy", "sxy"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(*[Sum(c, alias_name=c) for c in ("n", "sx", "sy", "sxx", "syy", "sxy")])
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False)
        sx, sy = t["sx"].to_numpy(zero_copy_only=False), t["sy"].to_numpy(zero_copy_only=False)
        sxx, syy = t["sxx"].to_numpy(zero_copy_only=False), t["syy"].to_numpy(zero_copy_only=False)
        sxy = t["sxy"].to_numpy(zero_copy_only=False)
        num = n * sxy - sx * sy
        den = np.sqrt(np.maximum(n * sxx - sx * sx, 0.0) * np.maximum(n * syy - sy * sy, 0.0))
        with np.errstate(invalid="ignore", divide="ignore"):
            corr = np.where(den > 0, num / den, np.nan)
        return pa.table(
            {
                "event_type": t["event_type"],
                "corr_value_hour": pa.array(np.round(corr, 4), pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# Bloom-pruned semi-join: the classic big-join optimization — build a small
# mergeable Bloom filter over the dim side's keys, broadcast it, and prune
# the fact side BEFORE any exchange. The Bloom answers "definitely not a
# member" exactly, so pruned rows are provably droppable; survivors get an
# exact membership verify (here a broadcast key set; at 100 TB the verify is
# the shuffle join itself, which the Bloom has already shrunk by the miss
# rate). Output is therefore EXACT — SQL-oracle-able end to end.

_BLOOM_BITS = 1 << 16  # 8 KiB bitmap: fixed-size partial, OR-mergeable
_BLOOM_K = 4


def _bloom_positions(keys: np.ndarray) -> np.ndarray:
    """(len(keys), _BLOOM_K) bit positions via k splitmix64 streams."""
    cols = [
        (_mix64(keys.astype(np.uint64) + np.uint64(0xA5A5A5A5 * (i + 1))) % np.uint64(_BLOOM_BITS)).astype(np.int64)
        for i in range(_BLOOM_K)
    ]
    return np.stack(cols, axis=1)


def bloom_semi_join_events(sf_dir: str, min_acctbal: float = 7500.0) -> Dataset:
    """events ⋉ {customers with c_acctbal > min_acctbal}, aggregated to
    (user_id, n_events, sum_value). Pipeline shape for 100 TB:

    1. dim scan -> per-batch PARTIAL Bloom bitmaps (fixed 8 KiB each), OR-
       merged on the driver: the exchange is O(#blocks x 8 KiB), key count
       irrelevant;
    2. ``ray.put`` the merged bitmap + (small-side) exact key set once;
    3. fact scan: vectorized k-probe bit test prunes misses, exact np.isin
       verifies survivors, per-batch partial aggregation;
    4. tiny groupby on the surviving user_ids."""
    import ray as _ray
    import ray.data as _rd
    from ray.data.aggregate import Sum as _Sum

    cust = _rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"])

    def dim_partial(t: pa.Table) -> pa.Table:
        keys = t.filter(pc.greater(t["c_acctbal"], min_acctbal))["c_custkey"].to_numpy(
            zero_copy_only=False
        )
        bitmap = np.zeros(_BLOOM_BITS >> 3, dtype=np.uint8)
        if len(keys):
            pos = _bloom_positions(keys).ravel()
            np.bitwise_or.at(bitmap, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        return pa.table(
            {
                "bitmap": pa.array([bitmap.tobytes()], pa.binary()),
                "keys": pa.array([keys.tolist()], pa.list_(pa.int64())),
            }
        )

    merged = np.zeros(_BLOOM_BITS >> 3, dtype=np.uint8)
    key_parts: list[np.ndarray] = []
    for b in cust.map_batches(
        dim_partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        for raw, ks in zip(b["bitmap"].to_pylist(), b["keys"].to_pylist()):
            merged |= np.frombuffer(raw, dtype=np.uint8)
            key_parts.append(np.asarray(ks, dtype=np.int64))
    keyset = np.unique(np.concatenate(key_parts)) if key_parts else np.zeros(0, np.int64)
    side_ref = _ray.put((merged, keyset))

    def fact_partial(t: pa.Table) -> pa.Table:
        from ..util import cached_get

        bitmap, keys = cached_get(side_ref)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        pos = _bloom_positions(uid)
        hit = np.ones(len(uid), dtype=bool)
        for i in range(_BLOOM_K):
            p = pos[:, i]
            hit &= (bitmap[p >> 3] & (1 << (p & 7)).astype(np.uint8)) != 0
        # exact verify of Bloom survivors (false positives dropped here)
        hit[hit] = np.isin(uid[hit], keys)
        sub = t.filter(pa.array(hit))
        g = sub.group_by("user_id", use_threads=False).aggregate(
            [("value", "sum"), ("event_id", "count")]
        )
        return pa.table(
            {
                "user_id": g["user_id"],
                "value_sum": g["value_sum"],
                "n": pc.cast(g["event_id_count"], pa.int64()),
            }
        )

    agg = (
        _events(sf_dir, ["event_id", "user_id", "value"])
        .map_batches(fact_partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(_Sum("value_sum", alias_name="sum_value"), _Sum("n", alias_name="n_events"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "n_events": pc.cast(t["n_events"], pa.int64()),
                "sum_value": pc.round(t["sum_value"], 4),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


def value_histogram(sf_dir: str, width: float = 25.0) -> Dataset:
    """Fixed-width equi-bin histogram of ``events.value`` — the mergeable
    distribution summary every profiling pass starts with. Per-batch
    partial = (bin, count) pairs; the global combine is one Sum over a
    range/width-bounded table, so the exchange never carries a value."""
    from ray.data.aggregate import Sum

    ds = _events(sf_dir, ["value"])

    def partial(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.floor(v / width).astype(np.int64)
        g = (
            pa.table({"bin": b})
            .group_by("bin", use_threads=False)
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["bin", "n"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
    )

    def finish(t: pa.Table) -> pa.Table:
        b = t["bin"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "bin": t["bin"],
                "lo": pa.array(b * width, pa.float64()),
                "n": pc.cast(t["n"], pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


# binned-quantile sketch configuration: bin width and the quantiles served.
# The sketch is DETERMINISTIC (unlike t-digest/KLL), so its estimates are
# SQL-oracle-able bit-for-bit: both sides bin, cumsum, and pick the first
# bin whose cumulative count reaches ceil(q*n).
_QSKETCH_WIDTH = 0.25
_QS = (0.5, 0.9, 0.99)


def approx_quantiles_value(
    sf_dir: str, width: float = _QSKETCH_WIDTH, qs: tuple[float, ...] = _QS
) -> Dataset:
    """Grouped approximate quantiles via a mergeable fixed-bin histogram
    sketch: per (event_type, bin) counts are the partial, the combine is a
    Sum, and the quantile estimate is the upper edge of the first bin whose
    cumulative count reaches ceil(q*n). Error is bounded by the bin width
    (here 0.25 on a 0-500 domain, ~0.05%), the sketch size by domain/width
    — the holistic sort a true grouped quantile needs never happens.
    Contrast with p95_value_by_type (exact, co-locates each group's
    values): this is the shape that still works when one group's values
    don't fit a node."""
    from ray.data.aggregate import Sum

    ds = _events(sf_dir, ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.floor(v / width).astype(np.int64)
        g = (
            pa.table({"event_type": t["event_type"], "bin": b})
            .group_by(["event_type", "bin"], use_threads=False)
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["event_type", "bin", "n"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby(["event_type", "bin"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        # one group per event_type: |types| x |bins| rows, trivially small
        g = g.sort_values("bin", kind="mergesort")
        cum = g["n"].cumsum().to_numpy()
        total = int(cum[-1])
        bins = g["bin"].to_numpy()
        rows = []
        for q in qs:
            need = float(np.ceil(q * total))
            i = int(np.searchsorted(cum, need, side="left"))
            est = (float(bins[i]) + 1.0) * width
            rows.append((g["event_type"].iloc[0], q, round(est, 6)))
        return pd.DataFrame(rows, columns=["event_type", "q", "est"])

    return agg.groupby("event_type").map_groups(finish, batch_format="pandas")


def distinct_users_by_type(sf_dir: str) -> Dataset:
    """Grouped COUNT(DISTINCT) — the two-level distinct shape: per-batch
    (type, user) distinct partial -> one exchange keyed on BOTH columns
    collapses global duplicates -> per-block count partial -> |types| Sum.
    No node ever holds a full distinct set and no user_id reaches the
    driver; at 100 TB the second exchange carries |types| ints per block."""
    from ray.data.aggregate import Max, Sum

    ds = _events(sf_dir, ["event_type", "user_id"])

    def pair_partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"event_type": t["event_type"], "user_id": t["user_id"]})
            .group_by(["event_type", "user_id"], use_threads=False)
            .aggregate([])
        )
        # dummy agg column: Ray's groupby needs at least one aggregate to
        # collapse global duplicates of the (type, user) key
        return g.append_column("one", pa.array(np.ones(g.num_rows, np.int8)))

    distinct_pairs = (
        ds.map_batches(pair_partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby(["event_type", "user_id"])
        .aggregate(Max("one", alias_name="one"))
    )

    def count_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("event_type", use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "n"])

    agg = (
        distinct_pairs.map_batches(count_partial, batch_format="pyarrow", batch_size=None)
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n_users"))
    )
    return agg.map_batches(
        lambda t: t.set_column(
            t.column_names.index("n_users"), "n_users", pc.cast(t["n_users"], pa.int64())
        ),
        batch_format="pyarrow", batch_size=None,
    )


def zscore_values_by_type(sf_dir: str) -> Dataset:
    """Grouped standardization z = (value - mean_type) / stddev_samp_type —
    the feature-normalization staple. Two passes: algebraic moment partials
    (n, sx, sxx) -> a |types|-bounded combine -> broadcast (mean, std) ->
    vectorized per-row transform via dictionary-coded lookup. The oracle
    SQL computes mean/std from the SAME raw moments so both sides share
    the formula bit-for-bit (streaming-variance implementations differ in
    the last ulps; ROUND(4) then removes summation-order noise)."""
    import ray
    from ray.data.aggregate import Sum

    ds = _events(sf_dir, ["event_id", "event_type", "value"])

    def moments(t: pa.Table) -> pa.Table:
        x = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        g = (
            pa.table(
                {"event_type": t["event_type"], "n": np.ones(len(x)), "sx": x, "sxx": x * x}
            )
            .group_by("event_type", use_threads=False)
            .aggregate([("n", "sum"), ("sx", "sum"), ("sxx", "sum")])
        )
        return g.rename_columns(["event_type", "n", "sx", "sxx"])

    stats = (
        ds.map_batches(moments, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"), Sum("sxx", alias_name="sxx"))
        .to_pandas()
    )
    mean = stats["sx"] / stats["n"]
    var = (stats["sxx"] - stats["n"] * mean * mean) / (stats["n"] - 1.0)
    side = {
        str(t): (float(m), float(np.sqrt(max(v, 0.0))))
        for t, m, v in zip(stats["event_type"], mean, var)
    }
    side_ref = ray.put(side)

    def zscore(t: pa.Table) -> pa.Table:
        from ..util import cached_get

        st = cached_get(side_ref)
        enc = t["event_type"].combine_chunks().dictionary_encode()
        ms = np.array([st[v][0] for v in enc.dictionary.to_pylist()])
        sd = np.array([st[v][1] for v in enc.dictionary.to_pylist()])
        codes = enc.indices.to_numpy(zero_copy_only=False)
        x = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        z = (x - ms[codes]) / sd[codes]
        return pa.table(
            {
                "event_id": t["event_id"],
                "event_type": t["event_type"],
                "z": pa.array(np.round(z, 4), pa.float64()),
            }
        )

    return ds.map_batches(zscore, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def cume_dist_value_by_type(sf_dir: str, max_distinct: int = 2_000_000) -> Dataset:
    """Exact CUME_DIST() OVER (PARTITION BY type ORDER BY value) without a
    global sort: the (type, value) count histogram is mergeable (values
    have bounded distinct cardinality), its per-type cumsum is tiny, and
    each row's rank is then a vectorized searchsorted against the
    broadcast distribution. The window function becomes two passes + a
    broadcast — the distribution-as-sketch shape.

    The bounded-cardinality assumption is ENFORCED, not implicit: the
    distinct (type, value) count is measured on the aggregated histogram
    (still distributed at that point) and past ``max_distinct`` the op
    raises instead of collecting an unbounded driver table — on a
    continuous value column at 100 TB "the histogram" is the dataset;
    ``approx_quantiles_value`` is the continuous-value alternative."""
    import ray
    from ray.data.aggregate import Sum

    ds = _events(sf_dir, ["event_id", "event_type", "value"])

    def hist_partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"event_type": t["event_type"], "value": t["value"]})
            .group_by(["event_type", "value"], use_threads=False)
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["event_type", "value", "n"])

    hist_ds = (
        ds.map_batches(hist_partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby(["event_type", "value"])
        .aggregate(Sum("n", alias_name="n"))
        .materialize()
    )
    n_distinct = hist_ds.count()
    if n_distinct > max_distinct:
        raise ValueError(
            f"cume_dist_value_by_type: {n_distinct} distinct (type, value) "
            f"pairs exceed max_distinct={max_distinct}; the exact-histogram "
            "plan only holds for bounded-cardinality values — use "
            "approx_quantiles_value for continuous columns"
        )
    hist = hist_ds.to_pandas()
    dist: dict[str, tuple[np.ndarray, np.ndarray, float]] = {}
    for ty, g in hist.groupby("event_type"):
        g = g.sort_values("value", kind="mergesort")
        vals = g["value"].to_numpy(dtype=np.float64)
        cum = g["n"].cumsum().to_numpy(dtype=np.float64)
        dist[str(ty)] = (vals, cum, float(cum[-1]))
    dist_ref = ray.put(dist)

    def cd(t: pa.Table) -> pa.Table:
        from ..util import cached_get

        d = cached_get(dist_ref)
        enc = t["event_type"].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        x = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        out = np.empty(len(x), np.float64)
        for code, ty in enumerate(enc.dictionary.to_pylist()):
            vals, cum, total = d[ty]
            m = codes == code
            idx = np.searchsorted(vals, x[m], side="right") - 1
            out[m] = cum[idx] / total
        return pa.table(
            {
                "event_id": t["event_id"],
                "event_type": t["event_type"],
                "cd": pa.array(np.round(out, 6), pa.float64()),
            }
        )

    return ds.map_batches(cd, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def mad_value_by_type(sf_dir: str) -> Dataset:
    """Robust outlier profile per event type: exact median, exact MEDIAN
    ABSOLUTE DEVIATION, and the count of values beyond the classic
    3 x 1.4826 x MAD robust-z fence. One groupby(event_type).map_groups
    computes all three from the whole group (same shape + bounded-group
    caveat as median_value_by_type; the binned quantile sketch is the
    continuous-scale alternative). The fence compares against the UNROUNDED
    median/MAD on both engines; only the reported columns are rounded."""
    ds = _events(sf_dir, ["event_type", "value"])

    def prof(g: pd.DataFrame) -> pd.DataFrame:
        v = g["value"].to_numpy(dtype=np.float64)
        med = float(np.median(v))
        dev = np.abs(v - med)
        mad = float(np.median(dev))
        n_out = int(np.count_nonzero(dev > 3.0 * 1.4826 * mad))
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "median_value": [round(med, 6)],
                "mad": [round(mad, 6)],
                "n_outliers": [n_out],
            }
        )

    return ds.groupby("event_type").map_groups(prof, batch_format="pandas")
