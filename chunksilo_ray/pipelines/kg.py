"""The flagship pipeline: transcripts Parquet -> knowledge-graph Parquet.

End-to-end composition (SURVEY.md §3.4 lifecycle):

    read_parquet(transcripts)
      -> assemble_dialogues        SHUFFLE #1 (conv_id, salt)       [ckpt]
      -> link_extract              actor pool + broadcast aliases   [ckpt]
      -> explode triples/mentions  (two branches off one checkpoint)
      -> build_canonical_map       SHUFFLE #2 (LSH bands) -> driver union-find
      -> apply map + materialize   SHUFFLE #3 (groupby-aggregate)
      -> write edges/ nodes/ Parquet
    (side branch) assembled -> chunk -> embed -> chunks/ Parquet

Checkpoint boundaries sit right after the shuffles (SURVEY.md §7.4), so a
resumed run skips the expensive exchanges. No ray.init() here — the driver
owns the session.
"""

from __future__ import annotations

import json
import pathlib
from concurrent.futures import ThreadPoolExecutor

import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..config import Config
from ..stages.assemble import assemble_dialogues
from ..stages.canon import build_canonical_map
from ..stages.chunk import chunk_turns
from ..stages.embed import embed_chunks
from ..stages.link import explode_mentions, link_extract
from ..stages.materialize import (
    materialize_edges,
    materialize_edges_agg,
    materialize_nodes,
)
from ..state.manifest import (
    StageCheckpoint,
    code_fingerprint,
    fingerprint,
    input_fingerprint,
)


class ScanStats:
    """Result of the combined one-pass scan over the extracted table."""

    __slots__ = ("dead_total", "norms", "convs", "dead_rows")

    def __init__(self, dead_total: int, norms: set, convs: set, dead_rows: list):
        self.dead_total = dead_total
        self.norms = norms
        self.convs = convs
        self.dead_rows = dead_rows  # [(conv_id, turn_idx, error), ...] capped


def scan_extracted_stats(
    extracted, collect_convs: bool = False, dead_cap: int = 1_000_000
):
    """Returns a zero-arg callable (pool-submittable) running ONE streaming
    pass over the extracted dataset that collects, as a tagged union of
    per-block partials: the dead-letter count AND rows (kind=3), the
    distinct unknown norms (kind=1, vocabulary-bounded by construction), and
    optionally the per-block distinct conv_ids (kind=2) for the incremental
    manifest. Driver memory is O(norm vocab + #convs + capped dead rows);
    at extreme conv counts the manifest write should switch to a distributed
    per-block write_parquet — documented, not needed below ~10^7 convs."""
    import pyarrow as _pa
    import pyarrow.compute as _pc

    from ..stages.canon import batch_distinct_unknown_norms

    def _flat(a):
        return a.combine_chunks() if isinstance(a, _pa.ChunkedArray) else a

    def _partial(t):
        n_err = int(t.num_rows - t.column("error").null_count)
        norms = _flat(batch_distinct_unknown_norms(t).column("norm"))
        kinds = [0] + [1] * len(norms)
        s_parts = [_pa.array([None], _pa.string()), norms]
        turn_parts = [_pa.array([None] * (1 + len(norms)), _pa.int64())]
        err_parts = [_pa.array([None] * (1 + len(norms)), _pa.string())]
        if collect_convs:
            convs = _flat(_pc.unique(t.column("conv_id")))
            kinds += [2] * len(convs)
            s_parts.append(convs)
            turn_parts.append(_pa.array([None] * len(convs), _pa.int64()))
            err_parts.append(_pa.array([None] * len(convs), _pa.string()))
        if n_err:
            dead = t.filter(_pc.is_valid(t.column("error")))
            kinds += [3] * dead.num_rows
            s_parts.append(_flat(dead.column("conv_id")))
            turn_parts.append(_flat(_pc.cast(dead.column("turn_idx"), _pa.int64())))
            err_parts.append(_flat(dead.column("error")))
        return _pa.table(
            {
                "kind": _pa.array(kinds, _pa.int8()),
                "n_err": _pa.array([n_err] + [0] * (len(kinds) - 1), _pa.int64()),
                "s": _pa.concat_arrays([_flat(a) for a in s_parts]),
                "turn_idx": _pa.concat_arrays([_flat(a) for a in turn_parts]),
                "err": _pa.concat_arrays([_flat(a) for a in err_parts]),
            }
        )

    def run() -> ScanStats:
        total = 0
        norms: set = set()
        convs: set = set()
        dead_rows: list = []
        capped = False
        for b in extracted.map_batches(
            _partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow"):
            kinds = b["kind"].to_pylist()
            ss = b["s"].to_pylist()
            total += int(sum(n for k, n in zip(kinds, b["n_err"].to_pylist()) if k == 0))
            for i, k in enumerate(kinds):
                if k == 1:
                    norms.add(ss[i])
                elif k == 2:
                    convs.add(ss[i])
                elif k == 3:
                    if len(dead_rows) < dead_cap:
                        dead_rows.append(
                            (ss[i], b["turn_idx"][i].as_py(), b["err"][i].as_py())
                        )
                    else:
                        capped = True
        if capped:
            import logging

            logging.getLogger(__name__).warning(
                "dead-letter rows exceeded cap=%d; export truncated (count is "
                "still exact) — switch to a distributed filter+write for "
                "pathological corpora",
                dead_cap,
            )
        return ScanStats(total, norms, convs, dead_rows)

    return run


def build_kg(
    transcripts_path: str,
    alias_path: str,
    out_dir: str,
    cfg: Config | None = None,
    with_chunks: bool = True,
) -> dict:
    """Run (or resume) the KG construction pipeline. Returns
    {"edges": Dataset, "nodes": Dataset, "chunks": Dataset|None,
     "metrics": dict, "out_dir": str}."""
    cfg = cfg or Config()
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    # opt-in stage wall-clock trace (GRAFT_TIMING=1): per-stage completion
    # offsets on stderr — the profiling hook behind BASELINE.md's scaling
    # analysis (stages overlap, so offsets are completion times, not costs)
    import os as _os
    import sys as _sys
    import time as _time

    _t0 = _time.perf_counter()
    _trace = _os.environ.get("GRAFT_TIMING") == "1"

    def _mark(name: str) -> None:
        if _trace:
            print(f"[kg +{_time.perf_counter() - _t0:7.2f}s] {name}",
                  file=_sys.stderr, flush=True)

    # explicit block-size control (north rule: target_max_block_size for
    # wide rows / very long conversations)
    tmbs = cfg.get("runtime.target_max_block_size")
    if tmbs:
        rd.DataContext.get_current().target_max_block_size = int(tmbs)

    # lineage root: inputs + the engine code itself — checkpoints produced by
    # an older code version must never be silently reused (the reference's
    # analog: reindex on version change)
    code_fp = code_fingerprint(str(pathlib.Path(__file__).resolve().parents[1]))
    in_fp = fingerprint(
        input_fingerprint(transcripts_path), input_fingerprint(alias_path), code_fp
    )

    # background checkpoint writer: disk-bound durable copies run OFF the
    # critical path; all futures are awaited before metrics/return
    writer = ThreadPoolExecutor(max_workers=2)

    # ---- stage 1: assembly (shuffle #1) -------------------------------------
    salt_threshold = cfg.get("assembly.salt_threshold")
    asm_fp = fingerprint(in_fp, "assemble", salt_threshold)
    asm_ckpt = StageCheckpoint(out_dir, "assembled", asm_fp)
    assembled = asm_ckpt.run(
        lambda: assemble_dialogues(
            rd.read_parquet(transcripts_path), salt_threshold=salt_threshold
        ),
        keep_in_memory=True,  # downstream consumers read pinned blocks
        write_executor=writer,
    )
    _mark("assembled materialized")

    # ---- stage 2: mention detect + entity link + triple extraction ----------
    alias_table = pq.read_table(alias_path)
    link_cfg = cfg.section("linking")
    ext_fp = fingerprint(asm_fp, "extract", sorted(link_cfg.items()))
    ext_ckpt = StageCheckpoint(out_dir, "extracted", ext_fp)

    def _build_extracted():
        alias_ref = ray.put(alias_table)  # broadcast once
        return link_extract(
            assembled,
            alias_ref,
            max_ngram=link_cfg["max_ngram"],
            batch_size=link_cfg["batch_size"],
            concurrency=link_cfg["concurrency"],
            num_cpus=link_cfg["num_cpus"],
            per_row_seconds=link_cfg["per_row_seconds"],
            mode=link_cfg.get("mode", "auto"),
        )

    # Overlapping independent Dataset executions on driver threads was the
    # round-2 design; measured head-to-head at sf0.3 it LOSES to strict
    # serialization (61 s vs 85 s at 16 CPUs): concurrent streaming
    # executions each assume they own the cluster, so they fight over CPU
    # slots, object-store memory and (on this DRAM-throttled host) memory
    # bandwidth instead of pipelining. Serial execution also scales more
    # honestly 4->16 CPUs — every stage gets the full cluster. The overlap
    # path is kept behind runtime.overlap for clusters where the branches
    # are I/O-heavy enough to interleave profitably.
    overlap = bool(cfg.get("runtime.overlap"))

    class _Inline:
        """submit() that just runs the fn — the serial twin of the pool."""

        @staticmethod
        def submit(fn, *a, **kw):
            from concurrent.futures import Future

            f: Future = Future()
            try:
                f.set_result(fn(*a, **kw))
            except BaseException as exc:  # noqa: BLE001 - future contract
                f.set_exception(exc)
            return f

    chunks_ckpt = None
    chunks_future = None
    pool = ThreadPoolExecutor(max_workers=3) if overlap else None
    if with_chunks:
        chk_cfg = cfg.section("chunking")
        emb_cfg = cfg.section("embedding")
        chunks_fp = fingerprint(asm_fp, "chunks", sorted(chk_cfg.items()), sorted(emb_cfg.items()))
        chunks_ckpt = StageCheckpoint(out_dir, "chunks", chunks_fp)

        def _build_chunks():
            return embed_chunks(
                chunk_turns(
                    assembled,
                    chunk_size=chk_cfg["chunk_size"],
                    chunk_overlap=chk_cfg["chunk_overlap"],
                ),
                backend=emb_cfg["backend"],
                dim=emb_cfg["dim"],
                batch_size=emb_cfg["batch_size"],
                concurrency=emb_cfg["concurrency"],
                num_cpus=emb_cfg["num_cpus"],
                mode=emb_cfg.get("mode", "auto"),
            )

        if overlap:
            chunks_future = pool.submit(chunks_ckpt.run, _build_chunks, write_executor=writer)
        # serial mode: chunks BUILD runs right after extraction (below), so
        # its background checkpoint write overlaps the canon/edges/nodes
        # compute instead of stalling the final durability barrier

    extracted = ext_ckpt.run(_build_extracted, keep_in_memory=True, write_executor=writer)
    _mark("extracted materialized")

    # ONE combined scan over the pinned extracted blocks collects FOUR
    # partials at once — the dead-letter count + rows (the extractor marks
    # failed rows with a non-null ``error``), the distinct unknown norms
    # canonicalization needs, and (when incremental tracking is on) the
    # per-block distinct conv_ids the append flow's membership check reads.
    # One pass over the biggest intermediate table instead of four.
    track = bool(cfg.get("incremental.track"))
    dead_cap = int(cfg.get("incremental.dead_letter_cap") or 1_000_000)
    _scan_extracted = scan_extracted_stats(
        extracted, collect_convs=track, dead_cap=dead_cap
    )

    # the scan is SMALL (one pass over pinned blocks + a tiny driver drain)
    # but a full streaming execution nonetheless — its executor startup and
    # drain are pure serial time if run inline. Even in serial mode it runs
    # on a background thread UNDER the chunks build (the one overlap that
    # measured as a win: the big execution's scheduling slack absorbs the
    # small one, unlike the round-2 big×big overlap that lost to DRAM
    # contention). Its result is first needed at canon time below.
    scan_pool = pool if overlap else ThreadPoolExecutor(max_workers=1)
    scan_future = scan_pool.submit(_scan_extracted)

    if with_chunks and not overlap:
        chunks_future = _Inline.submit(
            chunks_ckpt.run, _build_chunks, write_executor=writer
        )
        _mark("chunks built")

    # ---- stage 3: canonicalization (shuffle #2 + driver union-find) ---------
    canon_cfg = cfg.section("canon")
    cmap_path = out / "canonical_map.json"
    cmap_fp = fingerprint(ext_fp, "canon", sorted(canon_cfg.items()))
    cmap: dict[str, str]
    if cmap_path.exists():
        saved = json.loads(cmap_path.read_text())
        if saved.get("fingerprint") == cmap_fp:
            cmap = saved["map"]
        else:
            cmap = None  # type: ignore[assignment]
    else:
        cmap = None  # type: ignore[assignment]
    cmap_rebuilt = cmap is None
    if cmap is None:
        distinct_norms = scan_future.result().norms
        _mark("extracted scan drained")
        cmap = build_canonical_map(
            extracted,  # nested extraction output, pinned blocks
            num_perm=canon_cfg["num_perm"],
            bands=canon_cfg["bands"],
            shingle_k=canon_cfg["shingle_k"],
            max_group=canon_cfg["max_group"],
            max_pairs=canon_cfg["max_pairs"],
            jaccard_threshold=canon_cfg["jaccard_threshold"],
            cosine_threshold=canon_cfg["cosine_threshold"],
            norms=distinct_norms,  # collected by the combined scan above
        )
        cmap_path.write_text(json.dumps({"fingerprint": cmap_fp, "map": cmap}))
    # flat (norm, canonical) side table: lets an EXTERNAL SQL engine recompute
    # edges/nodes from the extracted checkpoint by joining the map (the
    # driver's kg_* DuckDB oracles) — tiny, rewritten with the map
    cmap_pq_path = out / "canonical_map.parquet"
    if cmap_rebuilt or not cmap_pq_path.exists():
        import pyarrow as _pa
        import pyarrow.parquet as _pqw

        norm_keys = sorted(cmap)
        _pqw.write_table(
            _pa.table(
                {
                    "norm": _pa.array(norm_keys, _pa.string()),
                    "canonical": _pa.array([cmap[k] for k in norm_keys], _pa.string()),
                }
            ),
            cmap_pq_path,
        )
    _mark("canonical map built")

    # ---- stage 4: graph materialize -----------------------------------------
    # edges: shuffle-free (per-turn weights computed in the explode pass);
    # edges_agg + nodes: partial pre-agg, then the small groupby exchange
    edges_fp = fingerprint(cmap_fp, "edges")
    edges_ckpt = StageCheckpoint(out_dir, "edges", edges_fp)
    edges_agg_fp = fingerprint(edges_fp, "edges_agg")
    edges_agg_ckpt = StageCheckpoint(out_dir, "edges_agg", edges_agg_fp)
    nodes_fp = fingerprint(cmap_fp, "nodes")
    nodes_ckpt = StageCheckpoint(out_dir, "nodes", nodes_fp)

    def _edges_chain():
        e = edges_ckpt.run(
            lambda: materialize_edges(extracted, cmap),
            keep_in_memory=True,
            write_executor=writer,
        )
        _mark("edges built")
        ea = edges_agg_ckpt.run(
            lambda: materialize_edges_agg(e), write_executor=writer
        )
        _mark("edges_agg built")
        return e, ea

    # edges(+agg) and nodes are independent — overlapped only when configured
    edges_future = (pool if overlap else _Inline).submit(_edges_chain)
    nodes = nodes_ckpt.run(
        lambda: materialize_nodes(extracted, cmap), write_executor=writer
    )
    _mark("nodes done")
    edges, edges_agg = edges_future.result()
    _mark("edges+agg done")

    # ---- side branch result (built after extraction in serial mode) --------
    chunks = chunks_future.result() if chunks_future is not None else None
    if pool is not None:
        pool.shutdown(wait=True)
    if scan_pool is not pool:
        scan_pool.shutdown(wait=True)

    # durability barrier: all background checkpoint writes must land before
    # metrics read the manifests / the call returns resumable state
    barrier = [asm_ckpt, ext_ckpt, edges_ckpt, edges_agg_ckpt, nodes_ckpt]
    if chunks_ckpt is not None:
        barrier.append(chunks_ckpt)
    for ck in barrier:
        fut = getattr(ck, "write_future", None)
        if fut is not None:
            fut.result()
    writer.shutdown(wait=True)
    _mark("checkpoint writes durable")

    stats = scan_future.result()

    # ---- incremental-ingest state + dead-letter surfacing -------------------
    # state/ carries what `append_kg` (pipelines/kg_append.py) needs to fold a
    # new day of conversations in WITHOUT touching the base corpus again:
    # the conv-id manifest (membership check), the distinct unknown norms
    # (canonical-map extension), and the build parameters. dead_letter/ is
    # the explicit-policy export of extractor-failed rows (SURVEY.md §4) —
    # counted in metrics AND persisted as a queryable Parquet partition.
    dead_letter_path = None
    if stats.dead_total:
        import pyarrow as _pa
        import pyarrow.parquet as _pqw

        dl_dir = out / "dead_letter"
        dl_dir.mkdir(exist_ok=True)
        dead_letter_path = str(dl_dir / "part-build.parquet")
        _pqw.write_table(
            _pa.table(
                {
                    "conv_id": _pa.array([r[0] for r in stats.dead_rows], _pa.string()),
                    "turn_idx": _pa.array([r[1] for r in stats.dead_rows], _pa.int64()),
                    "error": _pa.array([r[2] for r in stats.dead_rows], _pa.string()),
                }
            ),
            dead_letter_path,
        )
    if track:
        import pyarrow as _pa
        import pyarrow.parquet as _pqw

        state_dir = out / "state"
        (state_dir / "conv_ids").mkdir(parents=True, exist_ok=True)
        _pqw.write_table(
            _pa.table({"conv_id": _pa.array(sorted(stats.convs), _pa.string())}),
            state_dir / "conv_ids" / "part-build.parquet",
        )
        _pqw.write_table(
            _pa.table({"norm": _pa.array(sorted(stats.norms), _pa.string())}),
            state_dir / "distinct_norms.parquet",
        )
        (state_dir / "build_info.json").write_text(
            json.dumps(
                {
                    "transcripts_path": str(transcripts_path),
                    "alias_path": str(alias_path),
                    "code_fp": code_fp,
                    "in_fp": in_fp,
                    "cmap_fp": cmap_fp,
                    "edges_fp": edges_fp,
                    "edges_agg_fp": edges_agg_fp,
                    "nodes_fp": nodes_fp,
                    "appends": [],
                    "sections": {
                        k: dict(cfg.section(k))
                        for k in ("linking", "canon", "assembly", "incremental")
                    },
                },
                indent=1,
            )
        )

    metrics = {
        "turns": (asm_ckpt.manifest() or {}).get("rows"),
        "extracted_turns": (ext_ckpt.manifest() or {}).get("rows"),
        "edges": (edges_ckpt.manifest() or {}).get("rows"),
        "edges_agg": (edges_agg_ckpt.manifest() or {}).get("rows"),
        "nodes": (nodes_ckpt.manifest() or {}).get("rows"),
        "canonical_merges": len(cmap),
        "dead_letter_turns": stats.dead_total,
        "dead_letter_path": dead_letter_path,
    }
    edges_ckpt.record_metrics({"emitted_edges": metrics["edges"]})
    return {
        "edges": edges,
        "edges_agg": edges_agg,
        "nodes": nodes,
        "chunks": chunks,
        "metrics": metrics,
        "out_dir": str(out),
    }
