"""chunksilo_ray — a from-scratch, Ray-Data-native data-processing engine.

Re-expresses the capabilities of the reference engine (Chetic/chunksilo, a
single-process chunk-and-embed semantic search tool) as an idiomatic Ray Data
pipeline library, re-targeted at knowledge-graph construction over multi-turn
transcript Parquet tables:

    read_parquet(transcripts)
      -> assemble ordered dialogues   (groupby(conv_id) + sort(turn_idx))
      -> sentence-window chunking     (stateless map_batches, Arrow)
      -> embedding                    (actor pool, model in __init__)
      -> mention detect + entity link (actor pool + broadcast alias index)
      -> rule-based triple extraction (role/tool-aware predicates)
      -> MinHash-LSH canonicalization (band groupby + union-find)
      -> graph materialize            (groupby-aggregate -> nodes/edges Parquet)

Nothing in this package calls ``ray.init()`` / ``ray.shutdown()`` — the driver
owns the Ray session (see /root/repo/__ray_entry__.py).
"""

__version__ = "0.1.0"
