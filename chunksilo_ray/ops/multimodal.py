"""Multimodal column plumbing (task brief): image/audio/video as opaque
``binary`` columns with typed metadata; decode / feature-extract / resize /
frame-sample as actor-pool map_batches stages.

The decode kernels themselves are STUBBED (this container ships no
image/audio libraries — marked NotImplementedError / deterministic fake per
the task brief), but the Ray-side plumbing is real and tested: schema,
batch sizing for large binary payloads, actor signatures, output layout.

Scale notes baked in: binary payloads make blocks heavy, so these stages use
SMALL batch_size and pyarrow batch format end-to-end (binary columns do not
round-trip pandas cleanly — ray_guide.md pitfalls).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data import Dataset

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),  # -1 when unknown/not applicable
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synth_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus (binary payloads are seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(256, 4096)), dtype=np.uint8).tobytes()
        rows["media_id"].append(f"m-{i:06d}")
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append({"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind])
        rows["width"].append(int(rng.integers(64, 1920)) if kind != "audio" else -1)
        rows["height"].append(int(rng.integers(64, 1080)) if kind != "audio" else -1)
        rows["duration_ms"].append(int(rng.integers(500, 60000)) if kind != "image" else -1)
    return pa.table(rows, schema=MEDIA_SCHEMA)


def content_md5_16(payload: bytes) -> str:
    """16-hex-char content fingerprint, computed over the payload's lowercase
    hex encoding — byte-for-byte reproducible by an external SQL engine as
    ``substr(md5(lower(hex(payload))), 1, 16)`` (DuckDB's md5 only accepts
    VARCHAR, not BLOB), which is what makes the media queries value-oracle-able
    in the driver's correctness gate."""
    return hashlib.md5(payload.hex().encode()).hexdigest()[:16]


def write_media_parquet(path: str, n: int = 64, seed: int = 42) -> str:
    """Write the deterministic synthetic media corpus to Parquet so an
    external SQL oracle can recompute the media pipelines from the same
    input (the docs_dir_scan pattern: Ray query writes the input first, the
    oracle reads it). The file is recreated on every call — no staleness
    across corpus regenerations."""
    import pathlib

    import pyarrow.parquet as pq

    p = pathlib.Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    if p.exists():
        p.unlink()
    pq.write_table(synth_media_table(n=n, seed=seed), p)
    return str(p)


def decode_image_stub(payload: bytes) -> np.ndarray:  # pragma: no cover - stub
    """Real impl would be PIL/cv2; absent in this container (task brief:
    stub behind NotImplementedError)."""
    raise NotImplementedError("image decode requires PIL/cv2 — not in this environment")


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decode: seeded by payload hash -> tiny 'pixel'
    array. Keeps the actor/batch plumbing testable without media libs."""
    seed = zlib.crc32(payload)
    rng = np.random.default_rng(seed)
    w = max(1, min(width if width > 0 else 8, 8))
    h = max(1, min(height if height > 0 else 8, 8))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


class MediaFeatureActor:
    """Actor-pool stage: decode (fake) + feature-extract per batch. Real
    models/codecs load once per actor in __init__ (here: nothing to load,
    but the signature is the contract)."""

    def __init__(self, use_real_decoder: bool = False):
        self.use_real = use_real_decoder

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["media_id"].to_pylist()
        kinds = t["kind"].to_pylist()
        payloads = t["payload"].to_pylist()
        widths = t["width"].to_pylist()
        heights = t["height"].to_pylist()
        sizes, md5s, mean_px = [], [], []
        for payload, w, h in zip(payloads, widths, heights):
            sizes.append(len(payload))
            md5s.append(content_md5_16(payload))
            if self.use_real:  # pragma: no cover
                px = decode_image_stub(payload)
            else:
                px = _fake_decode(payload, w, h)
            mean_px.append(round(float(px.mean()), 4))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "kind": pa.array(kinds, pa.string()),
                "payload_bytes": pa.array(sizes, pa.int64()),
                "content_md5": pa.array(md5s, pa.string()),
                "mean_pixel": pa.array(mean_px, pa.float64()),
            }
        )


class FrameSampleActor:
    """Video frame-sampling plumbing: emits one row per sampled frame index
    (flat_map-shaped output from map_batches). Decode is fake/deterministic."""

    def __init__(self, every_ms: int = 5000):
        self.every_ms = every_ms

    def __call__(self, t: pa.Table) -> pa.Table:
        out_id, out_frame_idx, out_t_ms, out_md5 = [], [], [], []
        for mid, kind, payload, dur in zip(
            t["media_id"].to_pylist(),
            t["kind"].to_pylist(),
            t["payload"].to_pylist(),
            t["duration_ms"].to_pylist(),
        ):
            if kind != "video" or dur <= 0:
                continue
            fp = content_md5_16(payload)  # with a real codec: per-frame hash
            for k, t_ms in enumerate(range(0, dur, self.every_ms)):
                out_id.append(mid)
                out_frame_idx.append(k)
                out_t_ms.append(t_ms)
                out_md5.append(fp)
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.string()),
                "frame_idx": pa.array(out_frame_idx, pa.int32()),
                "t_ms": pa.array(out_t_ms, pa.int32()),
                "content_md5": pa.array(out_md5, pa.string()),
            }
        )


def media_features(media: pa.Table | None = None) -> Dataset:
    """Full multimodal pipeline over a (synthetic) media table: small batches
    because payloads are wide; actor pool; pyarrow end-to-end."""
    t = media if media is not None else synth_media_table()
    ds = rd.from_arrow(t)
    return ds.map_batches(
        MediaFeatureActor,
        batch_format="pyarrow",
        batch_size=16,  # binary payloads: keep batch x concurrency in heap
        concurrency=(1, 2),
        zero_copy_batch=True,
    )


def video_frames(media: pa.Table | None = None) -> Dataset:
    t = media if media is not None else synth_media_table()
    ds = rd.from_arrow(t)
    return ds.map_batches(
        FrameSampleActor, batch_format="pyarrow", batch_size=16, concurrency=(1, 2),
        zero_copy_batch=True
    )


def synth_media_with_dups(n: int = 64, seed: int = 7, n_dups: int = 8) -> pa.Table:
    """Deterministic media corpus WITH exact duplicates: the base synth
    table plus re-identified copies of its first ``n_dups`` payloads —
    the fixture for content-hash dedup over opaque binary columns."""
    base = synth_media_table(n=n, seed=seed)
    dup = base.slice(0, n_dups)
    dup = dup.set_column(
        dup.column_names.index("media_id"),
        "media_id",
        pa.array([f"zdup-{i:04d}" for i in range(n_dups)], pa.string()),
    )
    return pa.concat_tables([base, dup])


def media_dup_groups(media_path: str) -> Dataset:
    """Exact duplicate detection over an opaque binary media column: group
    payloads by 16-hex content fingerprint, keep groups with > 1 asset and
    report (content_md5, n_assets, min_media_id) — the canonical-asset
    pick. The payload itself never crosses an exchange: each scan block
    collapses to (fingerprint, count, min_id) partials and only those meet
    in the hash-keyed combine — the exact_dedup_docs contract applied to
    binary media."""
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    ds = rd.read_parquet(media_path, columns=["media_id", "payload"])

    def part(t: pa.Table) -> pa.Table:
        fps = [content_md5_16(p) for p in t["payload"].to_pylist()]
        g = (
            pa.table(
                {
                    "content_md5": pa.array(fps, pa.string()),
                    "n_assets": pa.array(np.ones(t.num_rows, np.int64)),
                    "min_media_id": t["media_id"].cast(pa.string()),
                }
            )
            .group_by("content_md5", use_threads=False)
            .aggregate([("n_assets", "sum"), ("min_media_id", "min")])
        )
        return g.rename_columns(["content_md5", "n_assets", "min_media_id"])

    agg = (
        ds.map_batches(part, batch_format="pyarrow", batch_size=None)
        .groupby("content_md5")
        .aggregate(
            Sum("n_assets", alias_name="n_assets"),
            Min("min_media_id", alias_name="min_media_id"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "content_md5": t["content_md5"],
                "n_assets": pc.cast(t["n_assets"], pa.int64()),
                "min_media_id": t["min_media_id"].cast(pa.string()),
            }
        )
        return t.filter(pc.greater(t["n_assets"], 1))

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)
