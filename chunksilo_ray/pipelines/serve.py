"""Thin query API over the materialized KG tables — the analog of the
reference's MCP serving surface (reference src/chunksilo/server.py:61-106:
one `search_docs(query, date_from, date_to)` tool over the persisted index,
module-level caches reused across requests, reference search.py:72-76).

The engine's "index" is the pipeline's Parquet output directory:
    out_dir/chunks   (chunk_id, conv_id, turn_idx, text, embedding, ...)
    out_dir/edges_agg (subj, pred, obj, weight)
    out_dir/nodes    (entity_id, surface, canonical, type, freq)

`search_docs` returns the reference's result-dict shape (README.md:22-44:
matched_files + chunks with location + counters + retrieval_time);
`entity_neighbors` / `entity_lookup` are the KG-native additions. Results
are small (top-k); the scans behind them stream with column pruning."""

from __future__ import annotations

import time

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..config import Config
from ..functions.textutils import normalize_surface
from .search import search_chunks

# module-level Dataset handles per out_dir (reference module-global caches,
# search.py:72-76) — lazy Datasets are cheap plans, the cache just avoids
# re-reading Parquet metadata per request
_chunk_cache: dict[str, "rd.Dataset"] = {}


def _chunks(out_dir: str) -> "rd.Dataset":
    if out_dir not in _chunk_cache:
        _chunk_cache[out_dir] = rd.read_parquet(f"{out_dir}/chunks")
    return _chunk_cache[out_dir]


def search_docs(
    out_dir: str,
    query: str,
    date_from: str | None = None,
    date_to: str | None = None,
    cfg: Config | None = None,
) -> dict:
    """Reference `search_docs` tool semantics over the chunks table: ranked
    chunks with location info + matched-conversation rollup + counters."""
    t0 = time.perf_counter()
    ranked = search_chunks(
        _chunks(out_dir), query, date_from=date_from, date_to=date_to, cfg=cfg
    ).take_all()
    matched: dict[str, float] = {}
    chunks_out = []
    for r in ranked:
        conv_uri = f"conv://{r['conv_id']}"
        matched[conv_uri] = max(matched.get(conv_uri, 0.0), r["score"])
        chunks_out.append(
            {
                "text": r["text"],
                "score": r["score"],
                "location": {
                    "uri": r["uri"],
                    "turn_idx": r["turn_idx"],
                    "heading_path": r["heading_path"],
                },
            }
        )
    return {
        "matched_files": [
            {"uri": u, "score": s}
            for u, s in sorted(matched.items(), key=lambda kv: -kv[1])
        ],
        "chunks": chunks_out,
        "num_matched_files": len(matched),
        "num_chunks": len(chunks_out),
        "query": query,
        "retrieval_time": round(time.perf_counter() - t0, 3),
    }


def entity_lookup(out_dir: str, surface: str, k: int = 10) -> list[dict]:
    """Resolve a surface form against the nodes table (exact norm match
    first, then prefix fallback), frequency-ranked."""
    norm = normalize_surface(surface)
    nodes = rd.read_parquet(f"{out_dir}/nodes")

    def match(t: pa.Table) -> pa.Table:
        exact = pc.equal(t["canonical"], norm)
        prefix = pc.starts_with(t["canonical"], norm)
        return t.filter(pc.or_(exact, prefix))

    hits = (
        nodes.map_batches(match, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .sort("freq", descending=True)
        .limit(k)
        .take_all()
    )
    return [
        {"entity_id": r["entity_id"], "canonical": r["canonical"],
         "type": r["type"], "freq": r["freq"]}
        for r in hits
    ]


def build_mcp_server(out_dir: str, cfg: Config | None = None, mcp=None):
    """Register the serving tools on a FastMCP server — the reference's MCP
    stdio surface (reference src/chunksilo/server.py:61-106: a FastMCP
    instance exposing `search_docs(query, date_from, date_to)` over the
    persisted index, run over stdio by the CLI).

    ``mcp`` may be injected (tests use a fake with the same ``tool()``
    decorator contract); by default the ``mcp`` package's FastMCP is
    imported lazily and a clear actionable error raised when the package is
    absent in this container (same seam pattern as the onnx embedding
    backend, stages/embed.py). Returns the server with three tools
    registered: search_docs, entity_lookup, entity_neighbors."""
    if mcp is None:
        try:  # pragma: no cover - mcp absent in this environment
            from mcp.server.fastmcp import FastMCP  # type: ignore[import-not-found]
        except ImportError as exc:
            raise RuntimeError(
                "the 'serve' command needs the 'mcp' package (FastMCP) for "
                "the stdio loop; install it, or use 'chunksilo_ray query' "
                "for one-shot requests over the same tables"
            ) from exc
        mcp = FastMCP("chunksilo-ray")  # pragma: no cover

    # bind the module-level request fns under private names so the tool
    # functions can carry the reference's public tool names (the inner defs
    # make those names function-local, so fetch the module fns via globals())
    _search = globals()["search_docs"]
    _lookup = globals()["entity_lookup"]
    _neighbors = globals()["entity_neighbors"]

    @mcp.tool()
    def search_docs(  # noqa: F811 - tool name contract (reference server.py:61)
        query: str, date_from: str | None = None, date_to: str | None = None
    ) -> dict:
        """Search the built chunk table; ranked chunks + conversation rollup."""
        return _search(out_dir, query, date_from=date_from, date_to=date_to, cfg=cfg)

    @mcp.tool()
    def entity_lookup(surface: str, k: int = 10) -> list:  # noqa: F811
        """Resolve a surface form against the KG nodes table."""
        return _lookup(out_dir, surface, k=k)

    @mcp.tool()
    def entity_neighbors(entity_id: str, k: int = 20) -> list:  # noqa: F811
        """Top-k weighted edges touching an entity in the aggregated KG."""
        return _neighbors(out_dir, entity_id, k=k)

    return mcp


def entity_neighbors(out_dir: str, entity_id: str, k: int = 20) -> list[dict]:
    """Top-k weighted edges touching an entity from the aggregated edge
    table — the KG-native query the reference's flat index cannot answer."""
    edges = rd.read_parquet(f"{out_dir}/edges_agg")

    def touch(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.or_(pc.equal(t["subj"], entity_id), pc.equal(t["obj"], entity_id))
        )

    hits = (
        edges.map_batches(touch, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .sort("weight", descending=True)
        .limit(k)
        .take_all()
    )
    return [
        {"subj": r["subj"], "pred": r["pred"], "obj": r["obj"], "weight": r["weight"]}
        for r in hits
    ]
