"""DuckDB value-oracles for the query registry (driver correctness gate).

One ANSI-SQL string per SQL-expressible entry of ``queries.queries()`` —
column names and float rounding match the Ray side exactly (the driver
sorts columns by name and hashes values). Genuinely non-SQL ops (IVF probe
search, streaming fixpoints, model scoring) are intentionally absent and
the driver records a rows-only check for them.
"""

from __future__ import annotations

from .queries import _MEDIA_DUP_PQ, _MEDIA_PQ


def _sql_str_list(words) -> str:
    """Render a python string collection as a DuckDB VARCHAR[] literal."""
    return "[" + ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(words)) + "]"


# word 3-gram (and bigram) shingle CTEs shared by the minhash / ngram oracles
_SHINGLE_CTE = """
    toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
             FROM documents),
    shl AS (SELECT doc_id,
              CASE WHEN len(w) = 0 THEN CAST([] AS VARCHAR[])
                   WHEN len(w) < {k} THEN [array_to_string(w, ' ')]
                   ELSE [{gram} FOR i IN range(1, len(w) - {km1} + 1)] END AS sh
            FROM toks),
    sh AS (SELECT DISTINCT doc_id, unnest(sh) AS s FROM shl),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    jpairs AS (SELECT da, db, i, sa.n + sb.n - i AS u
               FROM inter
               JOIN sizes sa ON sa.doc_id = da
               JOIN sizes sb ON sb.doc_id = db
               WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= {threshold})
"""

_SHINGLE3 = _SHINGLE_CTE.format(
    k=3, km1=2, threshold=0.7, gram="w[i] || ' ' || w[i+1] || ' ' || w[i+2]"
)
_SHINGLE2 = _SHINGLE_CTE.format(k=2, km1=1, threshold=0.5, gram="w[i] || ' ' || w[i+1]")

# KG pipeline output dir at the driver's sf0.01 correctness gate — the kg_*
# oracles read the intermediates the kg queries write there (docs_dir_scan
# pattern: Ray side runs first, then the SQL)
_KG_OUT01 = "/tmp/chunksilo_ray_kg_out/sf0.01"

# 64-bit md5-vote SimHash as hex (identical to chunksilo_ray.ops.dedup math)
_SIMHASH_CTE = """
    tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
            FROM documents),
    h AS (SELECT doc_id, CAST(('0x' || substr(md5(w), 1, 16)) AS UBIGINT) AS hv FROM tok),
    votes AS (SELECT doc_id, bi.i AS bi,
                     SUM(CASE WHEN (hv >> bi.i) & 1 = 1 THEN 1 ELSE -1 END) AS vote
              FROM h CROSS JOIN (SELECT unnest(range(0, 64)) AS i) bi
              GROUP BY doc_id, bi.i),
    packed AS (SELECT doc_id,
                      CAST(SUM(CASE WHEN vote > 0 THEN CAST(1 AS UBIGINT) << bi
                               ELSE CAST(0 AS UBIGINT) END) AS UBIGINT) AS v
               FROM votes GROUP BY doc_id),
    simhashes AS (SELECT d.doc_id,
                         COALESCE(lower(lpad(hex(p.v), 16, '0')),
                                  '0000000000000000') AS simhash
                  FROM documents d LEFT JOIN packed p ON d.doc_id = p.doc_id)
"""


def _pagerank_iter_ctes(n_iter: int, damping: float) -> str:
    """Shared chained-CTE power-iteration text (every node has degree >= 1
    after symmetrization, so each iteration's join covers the full node set
    and no dangling-mass term is needed)."""
    iters = []
    for k in range(1, n_iter + 1):
        iters.append(
            f"p{k} AS (SELECT e.t AS node, {1 - damping} + {damping} * SUM(p.pr / sd.deg) AS pr\n"
            f"          FROM edges e JOIN p{k - 1} p ON p.node = e.s\n"
            f"          JOIN deg sd ON sd.node = e.s GROUP BY e.t)"
        )
    return ",\n".join(iters)


def _pagerank_sql(n_iter: int = 5, damping: float = 0.85) -> str:
    """Oracle for ops/graph.py::pagerank_part_supplier."""
    return (
        "WITH e0 AS (SELECT DISTINCT 2 * l_partkey AS s, 2 * l_suppkey + 1 AS t\n"
        "            FROM lineitem),\n"
        "edges AS (SELECT s, t FROM e0 UNION ALL SELECT t AS s, s AS t FROM e0),\n"
        "deg AS (SELECT s AS node, CAST(COUNT(*) AS DOUBLE) AS deg\n"
        "        FROM edges GROUP BY 1),\n"
        "p0 AS (SELECT node, 1.0 AS pr FROM deg),\n"
        + _pagerank_iter_ctes(n_iter, damping)
        + f"\nSELECT CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END AS kind,\n"
        f"       CAST(node // 2 AS BIGINT) AS node_key, ROUND(pr, 5) AS pr\n"
        f"FROM p{n_iter}"
    )


def _kg_pagerank_sql(out_dir: str, n_iter: int = 5, damping: float = 0.85) -> str:
    """Oracle for ops/graph.py::entity_pagerank over the WRITTEN edges_agg
    checkpoint — power iteration joining on the entity STRING keys."""
    return (
        f"WITH e0 AS (SELECT DISTINCT subj AS s, obj AS t\n"
        f"            FROM read_parquet('{out_dir}/edges_agg/*.parquet')\n"
        f"            WHERE subj <> obj),\n"
        "edges AS (SELECT s, t FROM e0 UNION ALL SELECT t AS s, s AS t FROM e0),\n"
        "deg AS (SELECT s AS node, CAST(COUNT(*) AS DOUBLE) AS deg\n"
        "        FROM edges GROUP BY 1),\n"
        "p0 AS (SELECT node, 1.0 AS pr FROM deg),\n"
        + _pagerank_iter_ctes(n_iter, damping)
        + f"\nSELECT node AS entity, ROUND(pr, 5) AS pr FROM p{n_iter}"
    )


_PAGERANK_SQL = _pagerank_sql()


def _kg_ppr_sql(
    out_dir: str, n_seeds: int = 5, n_iter: int = 5, damping: float = 0.85
) -> str:
    """Oracle for ops/graph.py::kg_ppr — unrolled power iteration over the
    UNDIRECTED distinct-pair graph with teleport mass returning to the
    seed-indicator vector (seeds = top degree, ties by entity asc)."""
    head = (
        f"WITH e AS (SELECT DISTINCT subj, obj\n"
        f"           FROM read_parquet('{out_dir}/edges/*.parquet')\n"
        f"           WHERE subj <> obj),\n"
        "p AS (SELECT DISTINCT least(subj, obj) AS a, greatest(subj, obj) AS b FROM e),\n"
        "edges AS (SELECT a AS s, b AS t FROM p UNION ALL SELECT b, a FROM p),\n"
        "deg AS (SELECT s AS node, CAST(COUNT(*) AS DOUBLE) AS deg FROM edges GROUP BY 1),\n"
        f"seeds AS (SELECT node FROM deg ORDER BY deg DESC, node LIMIT {n_seeds}),\n"
        "nodes AS (SELECT deg.node, CASE WHEN s.node IS NULL THEN 0.0 ELSE 1.0 END AS ind\n"
        "          FROM deg LEFT JOIN seeds s ON s.node = deg.node),\n"
        "p0 AS (SELECT node, ind AS pr FROM nodes),\n"
    )
    iters = []
    for k in range(1, n_iter + 1):
        iters.append(
            f"p{k} AS (SELECT n.node, {1 - damping} * n.ind + {damping} * COALESCE(agg.c, 0) AS pr\n"
            f"          FROM nodes n LEFT JOIN (\n"
            f"            SELECT e.t AS node, SUM(pp.pr / sd.deg) AS c\n"
            f"            FROM edges e JOIN p{k - 1} pp ON pp.node = e.s\n"
            f"            JOIN deg sd ON sd.node = e.s GROUP BY e.t) agg\n"
            f"          ON agg.node = n.node)"
        )
    return (
        head
        + ",\n".join(iters)
        + f"\nSELECT node AS entity, ROUND(pr, 5) AS ppr FROM p{n_iter}"
    )


def _kg_hits_sql(out_dir: str, n_iter: int = 5) -> str:
    """Oracle for ops/graph.py::kg_hits — unrolled HITS half-steps over the
    DIRECTED distinct (subj, obj) graph, L1-normalized after each half-step
    exactly as the Ray op normalizes. Every per-iteration CTE is
    MATERIALIZED: DuckDB inlines plain CTEs per reference, which makes a
    multiply-referenced unrolled chain exponential in n_iter (measured as a
    hang at 5 iterations); normalization is a SUM() OVER () window so each
    score table is one self-contained CTE."""
    head = (
        f"WITH e AS MATERIALIZED (SELECT DISTINCT subj, obj\n"
        f"           FROM read_parquet('{out_dir}/edges/*.parquet')\n"
        f"           WHERE subj <> obj),\n"
        "nodes AS MATERIALIZED (SELECT subj AS node FROM e UNION SELECT obj FROM e),\n"
        "h0 AS MATERIALIZED (SELECT node, 1.0 AS v FROM nodes),\n"
    )
    iters = []
    for k in range(1, n_iter + 1):
        iters.append(
            f"a{k} AS MATERIALIZED (SELECT node, v / (SUM(v) OVER ()) AS v FROM (\n"
            f"    SELECT n.node, COALESCE(x.s, 0) AS v FROM nodes n\n"
            f"    LEFT JOIN (SELECT e.obj AS node, SUM(h.v) AS s\n"
            f"               FROM e JOIN h{k - 1} h ON h.node = e.subj\n"
            f"               GROUP BY 1) x ON x.node = n.node))"
        )
        iters.append(
            f"h{k} AS MATERIALIZED (SELECT node, v / (SUM(v) OVER ()) AS v FROM (\n"
            f"    SELECT n.node, COALESCE(x.s, 0) AS v FROM nodes n\n"
            f"    LEFT JOIN (SELECT e.subj AS node, SUM(a.v) AS s\n"
            f"               FROM e JOIN a{k} a ON a.node = e.obj\n"
            f"               GROUP BY 1) x ON x.node = n.node))"
        )
    return (
        head
        + ",\n".join(iters)
        + f"\nSELECT h.node AS entity, ROUND(h.v, 6) AS hub, ROUND(a.v, 6) AS authority\n"
        f"FROM h{n_iter} h JOIN a{n_iter} a USING (node)"
    )


def _kg_label_prop_sql(out_dir: str, n_iter: int = 3) -> str:
    """Oracle for ops/graph.py::kg_label_prop — unrolled synchronous
    label-propagation rounds over the undirected distinct-pair graph: each
    round every node adopts its neighbors' most frequent label, ties by the
    SMALLEST label string (= the Ray op's smallest-vocab-index tie-break;
    the vocabulary is sorted, DuckDB's default collation is the same binary
    order). MATERIALIZED per-round CTEs (the _kg_hits_sql lesson)."""
    head = (
        f"WITH e AS MATERIALIZED (SELECT DISTINCT subj, obj\n"
        f"           FROM read_parquet('{out_dir}/edges/*.parquet')\n"
        f"           WHERE subj <> obj),\n"
        "p AS MATERIALIZED (SELECT DISTINCT least(subj, obj) AS a, greatest(subj, obj) AS b FROM e),\n"
        "edges AS MATERIALIZED (SELECT a AS s, b AS t FROM p UNION ALL SELECT b, a FROM p),\n"
        "l0 AS MATERIALIZED (SELECT DISTINCT s AS node, s AS label FROM edges),\n"
    )
    iters = []
    for k in range(1, n_iter + 1):
        iters.append(
            f"l{k} AS MATERIALIZED (SELECT node, label FROM (\n"
            f"    SELECT e.s AS node, l.label AS label,\n"
            f"           ROW_NUMBER() OVER (PARTITION BY e.s\n"
            f"                              ORDER BY COUNT(*) DESC, l.label) AS rn\n"
            f"    FROM edges e JOIN l{k - 1} l ON l.node = e.t\n"
            f"    GROUP BY e.s, l.label) WHERE rn = 1)"
        )
    return (
        head
        + ",\n".join(iters)
        + f"\nSELECT node AS entity, label AS community FROM l{n_iter}"
    )


def _kg_walks_sql(
    out_dir: str, n_seeds: int = 8, walks_per_seed: int = 2, walk_len: int = 4
) -> str:
    """Oracle for ops/graph.py::kg_random_walks — replays every hop: sorted
    neighbor list per node, next index = md5 digest of "cur|walk|step"
    (first 8 hex chars as int) mod degree, the kg_negative_samples pattern."""
    wid_rows = ", ".join(f"({w})" for w in range(walks_per_seed))
    head = (
        f"WITH e AS (SELECT DISTINCT subj, obj\n"
        f"           FROM read_parquet('{out_dir}/edges/*.parquet')\n"
        f"           WHERE subj <> obj),\n"
        "p AS (SELECT DISTINCT least(subj, obj) AS a, greatest(subj, obj) AS b FROM e),\n"
        "edges AS (SELECT a AS s, b AS t FROM p UNION ALL SELECT b, a FROM p),\n"
        "adj AS (SELECT s AS node, list(t ORDER BY t) AS nbrs FROM edges GROUP BY 1),\n"
        "deg AS (SELECT s AS node, COUNT(*) AS deg FROM edges GROUP BY 1),\n"
        f"seeds AS (SELECT node FROM deg ORDER BY deg DESC, node LIMIT {n_seeds}),\n"
        f"w AS (SELECT * FROM (VALUES {wid_rows}) AS t(walk_id)),\n"
        "s0 AS (SELECT s.node AS seed, w.walk_id, 0 AS step, s.node AS entity\n"
        "       FROM seeds s CROSS JOIN w),\n"
    )
    steps = []
    for k in range(1, walk_len + 1):
        steps.append(
            f"s{k} AS (SELECT seed, walk_id, {k} AS step,\n"
            f"           a.nbrs[1 + CAST(CAST(('0x' || substr(md5(\n"
            f"             s.entity || '|' || CAST(walk_id AS VARCHAR) || '|{k}'\n"
            f"           ), 1, 8)) AS BIGINT) % len(a.nbrs) AS INT)] AS entity\n"
            f"         FROM s{k - 1} s JOIN adj a ON a.node = s.entity)"
        )
    union = "\nUNION ALL ".join(
        f"SELECT seed, walk_id, step, entity FROM s{k}" for k in range(walk_len + 1)
    )
    return head + ",\n".join(steps) + "\n" + union


def _kg_csize_sql(out_dir: str) -> str:
    """Oracle for ops/graph.py::kg_component_sizes — recursive-CTE min-label
    components over the undirected distinct-pair graph, then the size
    histogram (the ngram_dup_components oracle pattern)."""
    return (
        f"WITH RECURSIVE e AS (SELECT DISTINCT subj, obj\n"
        f"           FROM read_parquet('{out_dir}/edges/*.parquet')\n"
        f"           WHERE subj <> obj),\n"
        "p AS (SELECT DISTINCT least(subj, obj) AS a, greatest(subj, obj) AS b FROM e),\n"
        "edges AS (SELECT a AS s, b AS t FROM p UNION ALL SELECT b, a FROM p),\n"
        "walk(node, lbl) AS (\n"
        "    SELECT s, s FROM (SELECT DISTINCT s FROM edges)\n"
        "    UNION\n"
        "    SELECT e.t, w.lbl FROM walk w JOIN edges e ON e.s = w.node\n"
        "    WHERE w.lbl < e.t\n"
        "),\n"
        "comp AS (SELECT node, MIN(lbl) AS component FROM walk GROUP BY node),\n"
        "sizes AS (SELECT component, COUNT(*) AS size FROM comp GROUP BY 1)\n"
        "SELECT CAST(size AS BIGINT) AS size,\n"
        "       CAST(COUNT(*) AS BIGINT) AS n_components\n"
        "FROM sizes GROUP BY size"
    )


def _flagged_turns_sql(transcripts_pq: str, pattern: str = "(failing|error)") -> str:
    """Oracle for ops/window.py::flagged_turn_fraction — same RE2 pattern
    via regexp_matches; ROUND half-away matches the op's floor(x*1e6+0.5)."""
    return (
        "SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,\n"
        f"       CAST(SUM(CASE WHEN regexp_matches(text, '{pattern}')\n"
        "                      THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,\n"
        f"       ROUND(CAST(SUM(CASE WHEN regexp_matches(text, '{pattern}')\n"
        "                           THEN 1 ELSE 0 END) AS DOUBLE)\n"
        "             / count(*), 6) AS flag_fraction\n"
        f"FROM read_parquet('{transcripts_pq}')\n"
        "GROUP BY conv_id"
    )


def _prompt_dedup_sql(transcripts_pq: str) -> str:
    """Oracle for ops/window.py::prompt_prefix_dedup — first user turn per
    conversation by turn_idx, md5 digest, min-conv_id representative."""
    return (
        "WITH fu AS (SELECT conv_id, text FROM (\n"
        "        SELECT conv_id, text,\n"
        "               ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn\n"
        f"        FROM read_parquet('{transcripts_pq}') WHERE role = 'user') WHERE rn = 1),\n"
        "d AS (SELECT conv_id, md5(text) AS prompt_sha FROM fu)\n"
        "SELECT d.conv_id, d.prompt_sha, m.rep_conv_id, m.group_size\n"
        "FROM d JOIN (SELECT prompt_sha, MIN(conv_id) AS rep_conv_id,\n"
        "                    CAST(count(*) AS BIGINT) AS group_size\n"
        "             FROM d GROUP BY 1) m USING (prompt_sha)"
    )


def _kmeans_ctes(k: int = 8, iters: int = 2) -> list:
    """Shared CTE chain for the kmeans_assign / semdedup oracles — Lloyd's
    iterations unrolled (the PageRank-oracle pattern), ending with ``df``
    (final per-vector, per-cluster d2). Mirrors the Ray op's determinism
    contract exactly: init = k smallest vec_ids in vec_id order, argmin
    over ROUND(d2, 6) with lowest-cluster tie-break, centroid update
    ROUND(AVG, 6) with empty clusters keeping the previous centroid."""
    ctes = [
        "emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)",
        "flat AS (SELECT vec_id, UNNEST(e) AS val, generate_subscripts(e, 1) AS dim FROM emb)",
        "init AS (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster\n"
        f"         FROM (SELECT vec_id FROM emb ORDER BY vec_id LIMIT {k}))",
        "c0 AS (SELECT i.cluster, f.dim, f.val AS cval FROM init i JOIN flat f USING (vec_id))",
    ]
    for it in range(1, iters + 1):
        prev = f"c{it - 1}"
        ctes.append(
            f"d{it} AS (SELECT f.vec_id, c.cluster,\n"
            f"                 SUM((f.val - c.cval) * (f.val - c.cval)) AS d2\n"
            f"          FROM flat f JOIN {prev} c ON f.dim = c.dim GROUP BY 1, 2)"
        )
        ctes.append(
            f"a{it} AS (SELECT vec_id, cluster FROM (\n"
            f"            SELECT vec_id, cluster, ROW_NUMBER() OVER (\n"
            f"              PARTITION BY vec_id ORDER BY ROUND(d2, 6), cluster) AS rn\n"
            f"            FROM d{it}) WHERE rn = 1)"
        )
        ctes.append(
            f"c{it} AS (SELECT c.cluster, c.dim, COALESCE(ROUND(m.mv, 6), c.cval) AS cval\n"
            f"          FROM {prev} c LEFT JOIN (\n"
            f"            SELECT a.cluster, f.dim, AVG(f.val) AS mv\n"
            f"            FROM a{it} a JOIN flat f USING (vec_id) GROUP BY 1, 2) m\n"
            f"          ON m.cluster = c.cluster AND m.dim = c.dim)"
        )
    ctes.append(
        f"df AS (SELECT f.vec_id, c.cluster,\n"
        f"              SUM((f.val - c.cval) * (f.val - c.cval)) AS d2\n"
        f"       FROM flat f JOIN c{iters} c ON f.dim = c.dim GROUP BY 1, 2)"
    )
    return ctes


def _kmeans_sql(k: int = 8, iters: int = 2) -> str:
    """Oracle for ops/similarity.py::kmeans_assign (see _kmeans_ctes)."""
    return (
        "WITH " + ",\n".join(_kmeans_ctes(k, iters)) + "\n"
        "SELECT vec_id, CAST(cluster AS BIGINT) AS cluster, ROUND(d2, 4) AS dist2\n"
        "FROM (SELECT vec_id, cluster, d2, ROW_NUMBER() OVER (\n"
        "        PARTITION BY vec_id ORDER BY ROUND(d2, 6), cluster) AS rn FROM df)\n"
        "WHERE rn = 1"
    )


def _semdedup_sql(k: int = 8, iters: int = 2, tau: float = 0.95) -> str:
    """Oracle for ops/similarity.py::semdedup — the kmeans assignment CTEs
    plus an in-cluster pairwise cosine dedup: a vector is a duplicate of the
    SMALLEST earlier (lower vec_id) cluster-mate with raw cosine >= tau
    (the embedding_near_dups raw-threshold precedent)."""
    ctes = _kmeans_ctes(k, iters)
    ctes.append(
        "af AS (SELECT vec_id, cluster FROM (\n"
        "         SELECT vec_id, cluster, ROW_NUMBER() OVER (\n"
        "           PARTITION BY vec_id ORDER BY ROUND(d2, 6), cluster) AS rn\n"
        "         FROM df) WHERE rn = 1)"
    )
    ctes.append(
        f"dups AS (SELECT a2.vec_id AS i, MIN(a1.vec_id) AS dup_of\n"
        f"         FROM af a1\n"
        f"         JOIN af a2 ON a1.cluster = a2.cluster AND a1.vec_id < a2.vec_id\n"
        f"         JOIN emb e1 ON e1.vec_id = a1.vec_id\n"
        f"         JOIN emb e2 ON e2.vec_id = a2.vec_id\n"
        f"         WHERE list_cosine_similarity(e1.e, e2.e) >= {tau}\n"
        f"         GROUP BY a2.vec_id)"
    )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT af.vec_id, CAST(af.cluster AS BIGINT) AS cluster,\n"
        "       CAST(CASE WHEN d.dup_of IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep,\n"
        "       CAST(COALESCE(d.dup_of, -1) AS BIGINT) AS dup_of\n"
        "FROM af LEFT JOIN dups d ON d.i = af.vec_id"
    )


def oracle_sql() -> dict[str, str]:
    from chunksilo_ray.functions.textutils import STOPWORDS
    from chunksilo_ray.ops.textstats import _LANG_PROFILES

    stop_list = _sql_str_list(STOPWORDS)
    prof = {lang: _sql_str_list(words) for lang, words in _LANG_PROFILES.items()}
    return {
        # the docs_dir_scan query writes this tree deterministically from
        # documents.parquet BEFORE the oracle runs (driver order: Ray query
        # first, then SQL); the path matches the sf0.01 correctness gate
        "docs_dir_scan": """
            SELECT filename AS doc_path, content AS text
            FROM read_text('/tmp/chunksilo_ray_docs_tree/sf0.01/*.txt')
        """,
        # media queries write /tmp/chunksilo_ray_media/media.parquet first
        # (deterministic synth corpus); md5(lower(hex(payload))) matches the
        # engine's content_md5_16 byte-for-byte (DuckDB md5 is VARCHAR-only)
        "media_features": f"""
            SELECT media_id, kind,
                   octet_length(payload) AS payload_bytes,
                   substr(md5(lower(hex(payload))), 1, 16) AS content_md5
            FROM read_parquet('{_MEDIA_PQ}')
        """,
        "video_frames": f"""
            SELECT media_id,
                   CAST(t_ms // 5000 AS INTEGER) AS frame_idx,
                   CAST(t_ms AS INTEGER) AS t_ms,
                   substr(md5(lower(hex(payload))), 1, 16) AS content_md5
            FROM (
                SELECT media_id, payload,
                       unnest(generate_series(0, duration_ms - 1, 5000)) AS t_ms
                FROM read_parquet('{_MEDIA_PQ}')
                WHERE kind = 'video' AND duration_ms > 0
            )
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 4) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
                   ROUND(AVG(l_quantity), 4) AS avg_qty,
                   COUNT(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "lineitem_minmax_by_flag": """
            SELECT l_returnflag,
                   MIN(l_extendedprice) AS min_price,
                   MAX(l_extendedprice) AS max_price,
                   ROUND(AVG(l_extendedprice), 4) AS avg_price,
                   COUNT(*) AS n
            FROM lineitem GROUP BY l_returnflag
        """,
        "orders_per_customer": """
            SELECT o_custkey, COUNT(*) AS n_orders,
                   ROUND(SUM(o_totalprice), 4) AS total_spent
            FROM orders GROUP BY o_custkey
        """,
        "events_value_by_type": """
            SELECT event_type, ROUND(SUM(value), 4) AS total_value,
                   COUNT(value) AS n_events
            FROM events GROUP BY event_type
        """,
        "orders_by_year": """
            SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
                   COUNT(*) AS n_orders,
                   ROUND(SUM(o_totalprice), 4) AS total_price
            FROM orders GROUP BY 1
        """,
        "filter_events_date_range": """
            SELECT event_type, COUNT(*) AS n FROM events
            WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
            GROUP BY event_type
        """,
        "top_orders_by_price": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC LIMIT 10
        """,
        "high_value_projection": """
            SELECT l_orderkey, l_quantity,
                   l_extendedprice * (1 - l_discount) AS disc_price
            FROM lineitem WHERE l_quantity > 45
        """,
        "distinct_mktsegment": "SELECT DISTINCT c_mktsegment FROM customer",
        "union_regions_dedup": """
            SELECT r_regionkey, r_name FROM
              (SELECT * FROM region UNION ALL SELECT * FROM region)
            GROUP BY r_regionkey, r_name
        """,
        "customers_per_nation": """
            SELECT n.n_name, COUNT(*) AS n_customers
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
        """,
        "orders_with_customer_segment": """
            SELECT c.c_mktsegment,
                   ROUND(SUM(o.o_totalprice), 4) AS segment_revenue,
                   COUNT(*) AS n_orders
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment
        """,
        "customers_without_orders": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN
              (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        """,
        "supplier_nation_region": """
            SELECT s.s_suppkey, s.s_name, n.n_name, r.r_name
            FROM supplier s
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
        """,
        "recent_events_boosted": """
            SELECT event_id,
                   ROUND(value * (1 + 0.5 * EXP(-LN(2) *
                       (EXTRACT(epoch FROM ((SELECT MAX(ts) FROM events) - ts)) / 86400.0)
                       / 30.0)), 6) AS boosted_score
            FROM events ORDER BY boosted_score DESC LIMIT 20
        """,
        "doc_token_counts": """
            SELECT doc_id,
                   CAST(LEN(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens,
                   CAST(LENGTH(text) AS BIGINT) AS n_chars
            FROM documents
        """,
        "docs_by_lang": """
            SELECT lang, COUNT(*) AS n_docs, ROUND(AVG(n_chars), 4) AS avg_chars
            FROM documents GROUP BY lang
        """,
        "sample_docs_by_hash": """
            SELECT doc_id FROM documents WHERE substr(md5(text), 1, 1) = '0'
        """,
        "quality_filter": """
            SELECT doc_id,
                   CAST(LENGTH(text) AS BIGINT) AS n_chars,
                   ROUND(CAST(LENGTH(regexp_replace(text, '[A-Za-z0-9 .,]', '', 'g'))
                         AS DOUBLE) / LENGTH(text), 6) AS symbol_ratio
            FROM documents
            WHERE LENGTH(text) >= 200
              AND CAST(LENGTH(regexp_replace(text, '[A-Za-z0-9 .,]', '', 'g'))
                       AS DOUBLE) / LENGTH(text) <= 0.05
        """,
        "exact_dedup_docs": """
            SELECT MIN(doc_id) AS doc_id, MD5(text) AS text_hash
            FROM documents GROUP BY text
        """,
        "distinct_text_count": "SELECT COUNT(DISTINCT text) AS n_distinct FROM documents",
        "topk_events_per_user": """
            SELECT user_id, event_id, value, rank FROM (
              SELECT user_id, event_id, value,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY value DESC, event_id ASC) AS rank
              FROM events)
            WHERE rank <= 3
        """,
        "median_value_by_type": """
            SELECT event_type, ROUND(MEDIAN(value), 6) AS median_value
            FROM events GROUP BY event_type
        """,
        "asof_join": """
            SELECT p.event_id AS purchase_id, p.user_id,
                   c.event_id AS click_id,
                   ROUND(EXTRACT(epoch FROM (p.ts - c.ts)) * 1000, 3) AS ms_since_click
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
              ON p.user_id = c.user_id AND p.ts >= c.ts
        """,
        "range_join": """
            SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id
            FROM events p JOIN events c
              ON p.user_id = c.user_id
             AND p.event_type = 'purchase' AND c.event_type = 'click'
             AND c.ts >= p.ts - INTERVAL 5 MINUTE AND c.ts <= p.ts
        """,
        "tumbling_hourly": """
            SELECT user_id,
                   (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
                   COUNT(*) AS n_events,
                   ROUND(SUM(value), 4) AS value_sum
            FROM events GROUP BY 1, 2
        """,
        "session_windows": """
            WITH d AS (
              SELECT user_id, epoch_us(ts) AS ts_us, value,
                     CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                            OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                          THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
              SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                          ROWS UNBOUNDED PRECEDING) AS sid
              FROM d
            )
            SELECT user_id,
                   MIN(ts_us) AS session_start_us,
                   MAX(ts_us) AS session_end_us,
                   COUNT(*) AS n_events,
                   ROUND(SUM(value), 4) AS value_sum
            FROM s GROUP BY user_id, sid
        """,
        "rolling_per_user": """
            SELECT event_id, user_id,
                   ROUND(SUM(value) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING), 4)
                       AS running_value
            FROM events
        """,
        "phrase_scan": """
            SELECT doc_id, n_chars FROM documents
            WHERE lower(text) LIKE '%the data%'
        """,
        "cosine_topk": """
            SELECT vec_id,
                   ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                       (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
                        WHERE vec_id = 0)), 6) AS cosine
            FROM embeddings ORDER BY cosine DESC LIMIT 10
        """,
        # exhaustive-probe IVF == exact top-k (same oracle as cosine_topk)
        "ivf_topk_exhaustive": """
            SELECT vec_id,
                   ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                       (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
                        WHERE vec_id = 0)), 6) AS cosine
            FROM embeddings ORDER BY cosine DESC LIMIT 10
        """,
        # --- round-2 oracles: text analysis -------------------------------
        "kg_self_loop_audit": f"""
            SELECT pred,
                   CAST(COUNT(*) AS BIGINT) AS n_triples,
                   CAST(SUM(CASE WHEN subj = obj THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_self_loops,
                   CAST(SUM(weight) AS BIGINT) AS w_total,
                   CAST(SUM(CASE WHEN subj = obj THEN weight ELSE 0 END)
                          AS BIGINT) AS w_self
            FROM read_parquet('{_KG_OUT01}/edges_agg/*.parquet')
            GROUP BY pred
        """,
        "lang_confusion_matrix": f"""
            WITH t AS (SELECT lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
                       FROM documents),
            s AS (SELECT lang, len(w) AS n_tokens,
                         len(list_filter(w, x -> list_contains({prof['en']}, x))) AS h_en,
                         len(list_filter(w, x -> list_contains({prof['de']}, x))) AS h_de,
                         len(list_filter(w, x -> list_contains({prof['fr']}, x))) AS h_fr,
                         len(list_filter(w, x -> list_contains({prof['es']}, x))) AS h_es
                  FROM t),
            p AS (SELECT lang,
                         CASE WHEN n_tokens = 0
                                   OR 20 * GREATEST(h_en, h_de, h_fr, h_es) <= n_tokens THEN 'und'
                              WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es THEN 'en'
                              WHEN h_de >= h_fr AND h_de >= h_es THEN 'de'
                              WHEN h_fr >= h_es THEN 'fr' ELSE 'es' END AS pred_lang
                  FROM s)
            SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM p GROUP BY lang, pred_lang
        """,
        "detect_language": f"""
            WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
                       FROM documents),
            s AS (SELECT doc_id, len(w) AS n_tokens,
                         len(list_filter(w, x -> list_contains({prof['en']}, x))) AS h_en,
                         len(list_filter(w, x -> list_contains({prof['de']}, x))) AS h_de,
                         len(list_filter(w, x -> list_contains({prof['fr']}, x))) AS h_fr,
                         len(list_filter(w, x -> list_contains({prof['es']}, x))) AS h_es
                  FROM t)
            SELECT doc_id,
                   CASE WHEN n_tokens = 0
                             OR 20 * GREATEST(h_en, h_de, h_fr, h_es) <= n_tokens THEN 'und'
                        WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es THEN 'en'
                        WHEN h_de >= h_fr AND h_de >= h_es THEN 'de'
                        WHEN h_fr >= h_es THEN 'fr' ELSE 'es' END AS pred_lang,
                   CAST(GREATEST(h_en, h_de, h_fr, h_es) AS BIGINT) AS n_hits,
                   CAST(n_tokens AS BIGINT) AS n_tokens
            FROM s
        """,
        "quality_scores": f"""
            SELECT doc_id,
                   CAST(LENGTH(text) AS BIGINT) AS n_chars,
                   CAST(LENGTH(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS BIGINT)
                       AS n_alnum,
                   CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_words,
                   CAST(len(list_filter(regexp_extract_all(text, '[A-Za-z0-9]+'),
                            x -> list_contains({stop_list}, lower(x)))) AS BIGINT) AS n_stop
            FROM documents
        """,
        "fingerprint_docs": """
            WITH w AS (SELECT doc_id, md5(text) AS content_md5, text,
                              unnest(range(1, GREATEST(LENGTH(text) - 63, 1) + 1, 32)) AS i
                       FROM documents)
            SELECT doc_id,
                   MIN(substr(md5(substring(text, i, 64)), 1, 16)) AS fingerprint,
                   content_md5
            FROM w GROUP BY doc_id, content_md5
        """,
        "doc_headings": """
            WITH lines AS (
              SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
                     generate_subscripts(string_split(text, chr(10)), 1) AS li
              FROM documents),
            m AS (SELECT doc_id, line, li,
                         CASE WHEN regexp_matches(line, '^\\s*(```|~~~)') THEN 1 ELSE 0
                         END AS fence,
                         LENGTH(line) + 1 AS ll
                  FROM lines),
            p AS (SELECT doc_id, line, fence,
                         COALESCE(SUM(ll) OVER w, 0) AS pos,
                         COALESCE(SUM(fence) OVER w, 0) AS fences_before
                  FROM m
                  WINDOW w AS (PARTITION BY doc_id ORDER BY li
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
            SELECT doc_id,
                   regexp_extract(line, '^#{1,6}\\s+(.+?)\\s*$', 1) AS heading,
                   CAST(pos AS BIGINT) AS position,
                   CAST(LENGTH(regexp_extract(line, '^(#+)', 1)) AS BIGINT) AS level
            FROM p
            WHERE fence = 0 AND fences_before % 2 = 0
              AND regexp_matches(line, '^#{1,6}\\s+.')
        """,
        # --- round-2 oracles: dedup suite ---------------------------------
        "minhash_dup_groups": f"""
            WITH RECURSIVE {_SHINGLE3},
            edges AS (SELECT da AS a, db AS b FROM jpairs
                      UNION SELECT db, da FROM jpairs),
            reach(a, b) AS (SELECT a, b FROM edges
                            UNION
                            SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
            SELECT a AS doc_id, CAST(LEAST(MIN(b), a) AS BIGINT) AS dup_group
            FROM reach GROUP BY a
        """,
        # distributed CC over the verified bigram-jaccard pair graph: the
        # oracle recomputes the pairs in SQL and closes them transitively
        # minhash groups + integer quality rank: kept = row 1 of each
        # group ordered by (n_alnum DESC, doc_id)
        "dedup_keep_best": f"""
            WITH RECURSIVE {_SHINGLE3},
            edges AS (SELECT da AS a, db AS b FROM jpairs
                      UNION SELECT db, da FROM jpairs),
            reach(a, b) AS (SELECT a, b FROM edges
                            UNION
                            SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
            grp AS (SELECT a AS doc_id, CAST(LEAST(MIN(b), a) AS BIGINT) AS dup_group
                    FROM reach GROUP BY a),
            q AS (SELECT d.doc_id,
                         CAST(COALESCE((SELECT SUM(length(w))
                                        FROM UNNEST(regexp_extract_all(d.text, '[A-Za-z0-9]+')) AS t(w)),
                                       0) AS BIGINT) AS n_alnum
                  FROM documents d JOIN grp ON grp.doc_id = d.doc_id)
            SELECT grp.dup_group, grp.doc_id, q.n_alnum,
                   row_number() OVER (PARTITION BY grp.dup_group
                                      ORDER BY q.n_alnum DESC, grp.doc_id) = 1 AS kept
            FROM grp JOIN q ON q.doc_id = grp.doc_id
        """,
        "ngram_dup_components": f"""
            WITH RECURSIVE {_SHINGLE2},
            edges AS (SELECT da AS a, db AS b FROM jpairs
                      UNION SELECT db, da FROM jpairs),
            reach(a, b) AS (SELECT a, b FROM edges
                            UNION
                            SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
            SELECT a AS doc_id, CAST(LEAST(MIN(b), a) AS BIGINT) AS component
            FROM reach GROUP BY a
        """,
        # distributed PageRank: oracle = 5 unrolled power-iteration CTEs over
        # the same symmetrized bipartite graph (damping 0.85, ×N scale so
        # pr starts at 1.0 and teleport mass is exactly 1-d = 0.15)
        "pagerank_part_supplier": _PAGERANK_SQL,
        # same unrolled CTEs over the written KG edges_agg (string node keys)
        "kg_entity_pagerank": _kg_pagerank_sql(_KG_OUT01),
        # top-k TF-IDF terms per doc; ORDER BY the ROUNDED score (term asc
        # tiebreak) on both sides - reproducible across libm implementations
        "tfidf_top_terms": """
            WITH toks AS (SELECT doc_id,
                            unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
                          FROM documents),
            tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
            df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
            n AS (SELECT COUNT(*) AS n FROM documents),
            scored AS (SELECT t.doc_id, t.term, t.tf, d.df,
                         ROUND(t.tf * ln(CAST((SELECT n FROM n) AS DOUBLE) / d.df), 6)
                           AS score
                       FROM tf t JOIN df d USING (term)),
            ranked AS (SELECT *, row_number() OVER
                         (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
                       FROM scored)
            SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
                   score
            FROM ranked WHERE rn <= 3
        """,
        # exact despite the sketch: CMS never underestimates, so the
        # candidate filter keeps every true heavy hitter and the final
        # groupby + HAVING recomputes exact counts
        "heavy_hitter_users": """
            SELECT user_id, COUNT(*) AS n FROM events
            GROUP BY user_id HAVING COUNT(*) >= 75
        """,
        "orders_left_rich_segment": """
            SELECT c.c_mktsegment AS segment, COUNT(*) AS n_orders,
                   ROUND(SUM(o.o_totalprice), 4) AS segment_revenue
            FROM orders o LEFT JOIN
                 (SELECT c_custkey, c_mktsegment FROM customer
                  WHERE c_acctbal > 5000) c
              ON o.o_custkey = c.c_custkey
            GROUP BY 1
        """,
        "rollup_orders": """
            WITH o AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
                              o_orderpriority, o_totalprice FROM orders)
            SELECT order_year, o_orderpriority,
                   ROUND(SUM(o_totalprice), 2) AS revenue,
                   COUNT(*) AS n_orders
            FROM o GROUP BY ROLLUP(order_year, o_orderpriority)
        """,
        "lag_delta_per_user": """
            SELECT event_id, user_id,
                   ROUND(LAG(value) OVER w, 4) AS prev_value,
                   ROUND(value - LAG(value) OVER w, 4) AS delta
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "cap_docs_per_lang": """
            WITH h AS (SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS hh
                       FROM documents),
            r AS (SELECT doc_id, lang, row_number() OVER
                    (PARTITION BY lang ORDER BY hh, doc_id) AS rn
                  FROM h)
            SELECT doc_id, lang FROM r WHERE rn <= 50
        """,
        "ngram_jaccard_pairs": f"""
            WITH {_SHINGLE2}
            SELECT da AS doc_a, db AS doc_b, CAST(i AS BIGINT) AS inter,
                   CAST(u AS BIGINT) AS uni
            FROM jpairs
        """,
        "simhash_docs": f"""
            WITH {_SIMHASH_CTE}
            SELECT doc_id, simhash FROM simhashes
        """,
        "simhash_dup_pairs": f"""
            WITH {_SIMHASH_CTE},
            u AS (SELECT doc_id, CAST(('0x' || simhash) AS UBIGINT) AS v FROM simhashes)
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(bit_count(xor(a.v, b.v)) AS BIGINT) AS hamming
            FROM u a JOIN u b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.v, b.v)) <= 3
        """,
        "embedding_near_dups": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   ROUND(list_cosine_similarity(a.emb, b.emb), 6) AS cosine
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.emb, b.emb) >= 0.95
        """,
        # --- round-2 oracles: similarity / text search --------------------
        "label_centroids": """
            WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
            cnt AS (SELECT label, COUNT(*) AS n FROM e GROUP BY label),
            u AS (SELECT label, unnest(emb) AS val, generate_subscripts(emb, 1) AS dim
                  FROM e)
            SELECT u.label, CAST(u.dim AS BIGINT) AS dim,
                   ROUND(AVG(u.val), 6) AS value, cnt.n AS n_vectors
            FROM u JOIN cnt ON u.label = cnt.label
            GROUP BY u.label, u.dim, cnt.n
        """,
        # --- round-3 oracles: KG outputs recomputed by DuckDB from the
        # pipeline's written intermediates (extracted / edges checkpoints +
        # canonical_map.parquet). Like docs_dir_scan, the Ray query runs
        # first and writes these deterministically; the paths are keyed to
        # the sf0.01 correctness gate. Extraction itself stays pytest-gated
        # (P/R vs the in-repo oracle) — these verify canonicalization,
        # explode/weight, and both aggregations value-exactly.
        "kg_edges": f"""
            WITH ex AS (SELECT conv_id, turn_idx, unnest(triples) AS tr
                        FROM read_parquet('{_KG_OUT01}/extracted/*.parquet')),
            flat AS (SELECT conv_id, turn_idx, tr.subj AS subj0, tr.pred AS pred,
                            tr.obj AS obj0 FROM ex),
            cm AS (SELECT norm, canonical
                   FROM read_parquet('{_KG_OUT01}/canonical_map.parquet')),
            canon AS (
              SELECT conv_id, turn_idx, pred,
                CASE WHEN subj0 LIKE 'surface:%'
                     THEN 'ent:' || COALESCE(cs.canonical, substr(subj0, 9))
                     ELSE subj0 END AS subj,
                CASE WHEN obj0 LIKE 'surface:%'
                     THEN 'ent:' || COALESCE(co.canonical, substr(obj0, 9))
                     ELSE obj0 END AS obj
              FROM flat
              LEFT JOIN cm cs ON subj0 LIKE 'surface:%' AND cs.norm = substr(subj0, 9)
              LEFT JOIN cm co ON obj0 LIKE 'surface:%' AND co.norm = substr(obj0, 9))
            SELECT subj, pred, obj, conv_id, turn_idx, COUNT(*) AS weight
            FROM canon GROUP BY subj, pred, obj, conv_id, turn_idx
        """,
        "kg_edges_agg": f"""
            SELECT subj, pred, obj, CAST(SUM(weight) AS BIGINT) AS weight
            FROM read_parquet('{_KG_OUT01}/edges/*.parquet')
            GROUP BY subj, pred, obj
        """,
        "kg_nodes": f"""
            WITH ex AS (SELECT unnest(mentions) AS m
                        FROM read_parquet('{_KG_OUT01}/extracted/*.parquet')),
            flat AS (SELECT m.entity_id AS eid0, m.surface AS surface,
                            m.entity_type AS etype FROM ex),
            cm AS (SELECT norm, canonical
                   FROM read_parquet('{_KG_OUT01}/canonical_map.parquet')),
            canon AS (SELECT CASE WHEN eid0 LIKE 'surface:%'
                                  THEN 'ent:' || COALESCE(c.canonical, substr(eid0, 9))
                                  ELSE eid0 END AS entity_id,
                             surface, etype
                      FROM flat
                      LEFT JOIN cm c ON eid0 LIKE 'surface:%'
                                    AND c.norm = substr(eid0, 9))
            SELECT entity_id, surface,
                   regexp_replace(entity_id, '^[a-z]+:', '') AS canonical,
                   etype AS type, COUNT(*) AS freq
            FROM canon GROUP BY entity_id, surface, etype
        """,
        "kg_chunks": f"""
            SELECT chunk_id, conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
                   CAST(chunk_idx AS BIGINT) AS chunk_idx, role, tool,
                   CAST(epoch_us(ts) AS BIGINT) AS ts_us, text,
                   CAST(start_char AS BIGINT) AS start_char,
                   CAST(doc_char_start AS BIGINT) AS doc_char_start,
                   array_to_string(heading_path, '|') AS heading_path
            FROM read_parquet('{_KG_OUT01}/chunks/*.parquet')
        """,
        # --- round-3 batch-2 oracles ---------------------------------------
        "q3_top_orders": """
            WITH o AS (
              SELECT o_orderkey, o_orderdate, o_orderpriority
              FROM orders JOIN customer ON o_custkey = c_custkey
              WHERE c_mktsegment = 'BUILDING'
                AND o_orderdate < TIMESTAMP '1998-06-01'),
            l AS (SELECT l_orderkey,
                         ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
                  FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-06-01'
                  GROUP BY l_orderkey)
            SELECT l.l_orderkey, l.revenue, o.o_orderdate, o.o_orderpriority
            FROM l JOIN o ON l.l_orderkey = o.o_orderkey
            ORDER BY revenue DESC, l_orderkey LIMIT 10
        """,
        "props_key_histogram": """
            -- mirrors the Ray op's RE2 extraction exactly (both engines are
            -- RE2): rows whose props carry no integer k are FILTERED, not a
            -- NULL group — the op documents the flat-JSON assumption
            SELECT CAST(regexp_extract(props, '"k"\\s*:\\s*(-?\\d+)', 1) AS BIGINT) AS k,
                   COUNT(*) AS n
            FROM events
            WHERE regexp_matches(props, '"k"\\s*:\\s*-?\\d+')
            GROUP BY 1
        """,
        "users_click_and_purchase": """
            SELECT user_id FROM events WHERE event_type = 'click'
            INTERSECT
            SELECT user_id FROM events WHERE event_type = 'purchase'
        """,
        "p95_value_by_type": """
            SELECT event_type, ROUND(quantile_cont(value, 0.95), 6) AS p95_value
            FROM events GROUP BY event_type
        """,
        "corr_value_hour_by_type": """
            SELECT event_type,
                   ROUND(corr(value, EXTRACT(hour FROM ts)), 4) AS corr_value_hour
            FROM events GROUP BY event_type
        """,
        "pack_sequences": """
            WITH t AS (SELECT doc_id,
                              len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS nt
                       FROM documents),
            c AS (SELECT doc_id, nt,
                         COALESCE(SUM(nt) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
                  FROM t)
            SELECT doc_id, CAST(nt AS BIGINT) AS n_tokens,
                   CAST(cum // 512 AS BIGINT) AS seq_id
            FROM c
        """,
        "quantize_embeddings": """
            WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
            m AS (SELECT vec_id, emb,
                         list_max(list_transform(emb, x -> abs(x))) / 127.0 AS scale
                  FROM s),
            q AS (SELECT vec_id, scale,
                         CASE WHEN scale = 0 THEN list_transform(emb, x -> 0.0)
                              ELSE list_transform(emb, x -> trunc(x / scale)) END AS qv
                  FROM m)
            SELECT vec_id, ROUND(scale, 9) AS scale,
                   CAST(list_sum(qv) AS BIGINT) AS q_sum,
                   CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS q_l1
            FROM q
        """,
        "daily_new_users": """
            WITH f AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS d
                       FROM events GROUP BY user_id),
            c AS (SELECT d, COUNT(*) AS n_new FROM f GROUP BY d)
            SELECT strftime(d, '%Y-%m-%d') AS day, CAST(n_new AS BIGINT) AS n_new,
                   CAST(SUM(n_new) OVER (ORDER BY d) AS BIGINT) AS cum_users
            FROM c
        """,
        "funnel_stages": """
            WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
                       WHERE event_type = 'view' GROUP BY user_id),
            c AS (SELECT v.user_id, MIN(e.ts) AS t2 FROM v
                  JOIN events e ON e.user_id = v.user_id
                   AND e.event_type = 'click' AND e.ts > v.t1
                  GROUP BY v.user_id),
            p AS (SELECT c.user_id, MIN(e.ts) AS t3 FROM c
                  JOIN events e ON e.user_id = c.user_id
                   AND e.event_type = 'purchase' AND e.ts > c.t2
                  GROUP BY c.user_id)
            SELECT stage, CAST(n AS BIGINT) AS n_users FROM (
              SELECT 1 AS stage, (SELECT COUNT(*) FROM v) AS n
              UNION ALL SELECT 2, (SELECT COUNT(*) FROM c)
              UNION ALL SELECT 3, (SELECT COUNT(*) FROM p)) t
        """,
        "bloom_semi_join_events": """
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   ROUND(SUM(value), 4) AS sum_value
            FROM events
            WHERE user_id IN (SELECT c_custkey FROM customer
                              WHERE c_acctbal > 7500)
            GROUP BY user_id
        """,
        "decontaminate_docs": """
            WITH probes AS (
              SELECT DISTINCT substr(text, 1, 40) AS p FROM documents
              WHERE doc_id % 100 = 7 AND length(substr(text, 1, 40)) >= 20
            )
            SELECT d.doc_id FROM documents d
            WHERE d.doc_id % 100 <> 7
              AND NOT EXISTS (SELECT 1 FROM probes WHERE position(p IN d.text) > 0)
        """,
        "doc_line_repetition": """
            WITH l AS (SELECT doc_id, string_split(text, chr(10)) AS ls
                       FROM documents)
            SELECT doc_id,
                   CAST(len(ls) AS BIGINT) AS n_lines,
                   CAST(len(list_distinct(ls)) AS BIGINT) AS n_distinct_lines,
                   ROUND(1.0 - CAST(len(list_distinct(ls)) AS DOUBLE)
                         / GREATEST(len(ls), 1), 6) AS dup_line_frac,
                   ROUND(1.0 - CAST(len(list_distinct(ls)) AS DOUBLE)
                         / GREATEST(len(ls), 1), 6) <= 0.30 AS keep
            FROM l
        """,
        "top_bigrams": """
            WITH words AS (
              SELECT string_split(
                       regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' ') AS l
              FROM documents
            ),
            bg AS (
              SELECT l[i] || ' ' || l[i + 1] AS bigram
              FROM words,
                   LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) AS i) t
              WHERE l[i] <> '' AND l[i + 1] <> ''
            )
            SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
            FROM bg GROUP BY bigram ORDER BY n DESC, bigram LIMIT 50
        """,
        "mix_sources": """
            SELECT doc_id, source FROM documents
            WHERE (CAST(substr(source, 4) AS INTEGER) % 4 = 0)
               OR (CAST(substr(source, 4) AS INTEGER) % 4 IN (1, 2)
                   AND substr(md5(text), 1, 4) < '8000')
               OR (CAST(substr(source, 4) AS INTEGER) % 4 = 3
                   AND substr(md5(text), 1, 4) < '4000')
        """,
        # PII patterns are RE2 on BOTH engines (pyarrow + DuckDB), so the
        # redacted text is byte-compared; corpus carries no PII, so the
        # constructed-positive gate lives in tests/test_curation.py
        "redact_pii": r"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
                     AS n_emails,
                   CAST(len(regexp_extract_all(text,
                     '\d{3}[-.]\d{3}[-.]\d{4}')) AS BIGINT) AS n_phones,
                   len(regexp_extract_all(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) = 0
                   AND len(regexp_extract_all(text,
                     '\d{3}[-.]\d{3}[-.]\d{4}')) = 0 AS pii_free,
                   regexp_replace(regexp_replace(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                     '[EMAIL]', 'g'),
                     '\d{3}[-.]\d{3}[-.]\d{4}', '[PHONE]', 'g') AS redacted
            FROM documents
        """,
        "doc_bigram_repetition": """
            WITH words AS (
              SELECT doc_id, string_split(
                       regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' ') AS l
              FROM documents
            ),
            bg AS (
              SELECT doc_id, l[i] || ' ' || l[i + 1] AS bigram
              FROM words,
                   LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) AS i) t
              WHERE l[i] <> '' AND l[i + 1] <> ''
            ),
            per AS (SELECT doc_id, COUNT(*) AS c FROM bg GROUP BY doc_id, bigram),
            agg AS (SELECT doc_id, SUM(c) AS n_bigrams, MAX(c) AS top_n
                    FROM per GROUP BY doc_id)
            SELECT d.doc_id,
                   CAST(COALESCE(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
                   CAST(COALESCE(a.top_n, 0) AS BIGINT) AS top_n,
                   ROUND(CAST(COALESCE(a.top_n, 0) AS DOUBLE)
                         / GREATEST(COALESCE(a.n_bigrams, 0), 1), 6) AS top_bigram_frac,
                   ROUND(CAST(COALESCE(a.top_n, 0) AS DOUBLE)
                         / GREATEST(COALESCE(a.n_bigrams, 0), 1), 6) <= 0.125 AS keep
            FROM documents d LEFT JOIN agg a USING (doc_id)
        """,
        "build_postings": """
            WITH toks AS (SELECT doc_id,
                                 regexp_extract_all(lower(text), '[a-z0-9]+') AS w
                          FROM documents),
            ex AS (SELECT doc_id, unnest(w) AS term FROM toks)
            SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
            FROM ex GROUP BY term, doc_id
        """,
        "term_stats": """
            WITH toks AS (SELECT doc_id,
                                 regexp_extract_all(lower(text), '[a-z0-9]+') AS w
                          FROM documents),
            ex AS (SELECT doc_id, unnest(w) AS term FROM toks),
            post AS (SELECT term, doc_id, COUNT(*) AS tf
                     FROM ex GROUP BY term, doc_id),
            n AS (SELECT COUNT(*) AS n_docs FROM documents)
            SELECT term,
                   CAST(COUNT(*) AS BIGINT) AS df,
                   CAST(SUM(tf) AS BIGINT) AS cf,
                   ROUND(ln((n.n_docs - COUNT(*) + 0.5) / (COUNT(*) + 0.5) + 1.0), 6)
                     AS idf
            FROM post, n GROUP BY term, n.n_docs
        """,
        "knn_join": """
            WITH q AS (SELECT vec_id AS query_id,
                              CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id < 8),
            s AS (SELECT q.query_id, e.vec_id,
                         ROUND(list_cosine_similarity(
                           CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS cosine
                  FROM embeddings e, q WHERE e.vec_id <> q.query_id),
            r AS (SELECT query_id, vec_id, cosine,
                         CAST(row_number() OVER (PARTITION BY query_id
                           ORDER BY cosine DESC, vec_id) AS BIGINT) AS rank
                  FROM s)
            SELECT query_id, vec_id, cosine, rank FROM r WHERE rank <= 10
        """,
        "bm25_topk": """
            WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
                          FROM documents),
            stats AS (SELECT COUNT(*) AS n_docs, SUM(len(w)) AS len_sum FROM toks),
            terms AS (SELECT unnest(['data', 'processing', 'pipeline']) AS term),
            tf AS (SELECT doc_id, term, len(list_filter(w, x -> x = term)) AS tf,
                          len(w) AS dl
                   FROM toks CROSS JOIN terms),
            df AS (SELECT term, SUM(CASE WHEN tf > 0 THEN 1 ELSE 0 END) AS df
                   FROM tf GROUP BY term),
            scored AS (
              SELECT doc_id,
                     SUM(LN(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                         * tf * 2.5
                         / (tf + 1.5 * (1 - 0.75 + 0.75 * dl /
                              GREATEST(1.0, CAST(s.len_sum AS DOUBLE)
                                            / GREATEST(1, s.n_docs))))) AS score
              FROM tf JOIN df d USING (term) CROSS JOIN stats s
              WHERE tf > 0 GROUP BY doc_id)
            SELECT doc_id, ROUND(score, 6) AS bm25 FROM scored
            WHERE score > 0 ORDER BY bm25 DESC, doc_id LIMIT 10
        """,
        # --- batch 5 ---
        "pivot_events_daily": """
            SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
                   CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
                   CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
                   CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
            FROM events GROUP BY 1
        """,
        "latest_event_per_user_type": """
            SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                   event_id, value
            FROM events
            QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts DESC, event_id DESC) = 1
        """,
        "event_path_per_user": """
            WITH r AS (SELECT user_id, event_type,
                              ROW_NUMBER() OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id) AS rn
                       FROM events)
            SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
            FROM r WHERE rn <= 8 GROUP BY user_id
        """,
        "value_histogram": """
            SELECT CAST(FLOOR(value / 25.0) AS BIGINT) AS bin,
                   CAST(FLOOR(value / 25.0) AS BIGINT) * 25.0 AS lo,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        """,
        "approx_quantiles_value": """
            WITH cnt AS (SELECT event_type,
                                CAST(FLOOR(value / 0.25) AS BIGINT) AS bin,
                                COUNT(*) AS n
                         FROM events GROUP BY 1, 2),
            tot AS (SELECT event_type, SUM(n) AS total FROM cnt GROUP BY 1),
            cum AS (SELECT event_type, bin,
                           SUM(n) OVER (PARTITION BY event_type
                                        ORDER BY bin) AS cum
                    FROM cnt),
            qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS q)
            SELECT c.event_type, qs.q AS q,
                   ROUND(MIN((c.bin + 1) * 0.25), 6) AS est
            FROM cum c JOIN tot t USING (event_type) CROSS JOIN qs
            WHERE c.cum >= CEIL(qs.q * t.total)
            GROUP BY 1, 2
        """,
        "normalize_docs": """
            WITH n AS (SELECT doc_id,
                              trim(regexp_replace(lower(text),
                                   '[ \t\r\n]+', ' ', 'g'), ' ') AS norm_text
                       FROM documents)
            SELECT doc_id, norm_text,
                   CAST(length(norm_text) AS BIGINT) AS n_chars_norm
            FROM n
        """,
        "distinct_users_by_type": """
            SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY 1
        """,
        "zscore_values_by_type": """
            WITH s AS (SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
                              SUM(value) AS sx, SUM(value * value) AS sxx
                       FROM events GROUP BY 1),
            m AS (SELECT event_type, sx / n AS mean,
                         sqrt(GREATEST((sxx - n * (sx / n) * (sx / n)) / (n - 1.0),
                                       0.0)) AS sd
                  FROM s)
            SELECT e.event_id, e.event_type,
                   ROUND((e.value - m.mean) / m.sd, 4) AS z
            FROM events e JOIN m USING (event_type)
        """,
        "cume_dist_value_by_type": """
            SELECT event_id, event_type,
                   ROUND(CUME_DIST() OVER (PARTITION BY event_type
                                           ORDER BY value), 6) AS cd
            FROM events
        """,
        "long_docs_per_lang": """
            WITH cnt AS (SELECT lang, n_chars, COUNT(*) AS c
                         FROM documents GROUP BY 1, 2),
            tot AS (SELECT lang, SUM(c) AS n FROM cnt GROUP BY 1),
            cum AS (SELECT lang, n_chars,
                           SUM(c) OVER (PARTITION BY lang ORDER BY n_chars) AS cum
                    FROM cnt),
            thr AS (SELECT c.lang, MIN(c.n_chars) AS cut
                    FROM cum c JOIN tot t USING (lang)
                    WHERE c.cum >= CEIL(0.9 * t.n) GROUP BY 1)
            SELECT d.doc_id, d.lang, d.n_chars
            FROM documents d JOIN thr ON d.lang = thr.lang
            WHERE d.n_chars >= thr.cut
        """,
        "kmeans_assign": _kmeans_sql(),
        "semdedup": _semdedup_sql(),
        # corpus-global paragraph dedup: exact text-equality dup criterion,
        # rebuild via ordered string_agg (NULL when nothing survives —
        # matches the op's when/otherwise)
        "split_leakage_audit": f"""
            WITH RECURSIVE {_SHINGLE3},
            sp AS (SELECT doc_id,
                          CASE substr(md5(text), 1, 1)
                               WHEN 'e' THEN 'val'
                               WHEN 'f' THEN 'test'
                               ELSE 'train' END AS split
                   FROM documents)
            SELECT j.da AS doc_a, j.db AS doc_b,
                   sa.split AS split_a, sb.split AS split_b
            FROM jpairs j
            JOIN sp sa ON sa.doc_id = j.da
            JOIN sp sb ON sb.doc_id = j.db
            WHERE sa.split <> sb.split
        """,
        # char-bigram LM trained on the corpus itself (bounded <=37^2
        # vocabulary); every scored bigram is in the training counts, so
        # both engines evaluate the same Laplace logprobs
        "lm_perplexity_scores": """
            WITH norm AS (SELECT doc_id,
                                 trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' ') AS x
                          FROM documents),
            bg AS (SELECT doc_id, substr(x, i, 2) AS b
                   FROM norm, UNNEST(range(1, length(x))) AS u(i)),
            cnt AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY b),
            tot AS (SELECT SUM(c) AS t FROM cnt),
            scored AS (SELECT bg.doc_id,
                              CAST(count(*) AS BIGINT) AS n_bigrams,
                              SUM(-ln((cnt.c + 1.0) / (tot.t + 1369))) AS nll
                       FROM bg JOIN cnt ON cnt.b = bg.b, tot
                       GROUP BY bg.doc_id)
            SELECT d.doc_id,
                   CAST(COALESCE(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
                   ROUND(s.nll / s.n_bigrams, 4) AS mean_nll
            FROM documents d LEFT JOIN scored s ON s.doc_id = d.doc_id
        """,
        # DSIR importance: literal-bigram top-V vocabulary (count DESC,
        # bigram ASC), Laplace +1 over vocab-restricted totals, ln ratio
        # summed per doc; ROUND 4 coarse vs float-association noise
        "dsir_importance": """
            WITH toks AS (SELECT doc_id,
                                 regexp_extract_all(lower(text), '[a-z0-9]+') AS t
                          FROM documents),
            bg AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS b
                   FROM toks, UNNEST(range(1, len(t))) AS u(i)),
            tgt AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM bg
                    WHERE doc_id % 100 = 7 GROUP BY b),
            vocab AS (SELECT b, c FROM tgt ORDER BY c DESC, b LIMIT 1000),
            corp AS (SELECT bg.b, CAST(count(*) AS BIGINT) AS c
                     FROM bg JOIN vocab ON vocab.b = bg.b GROUP BY bg.b),
            tot AS (SELECT (SELECT SUM(c) FROM vocab) + (SELECT count(*) FROM vocab) AS tt,
                           (SELECT SUM(c) FROM corp) + (SELECT count(*) FROM vocab) AS tc),
            lr AS (SELECT vocab.b,
                          ln(((vocab.c + 1.0) / tot.tt) /
                             ((COALESCE(corp.c, 0) + 1.0) / tot.tc)) AS r
                   FROM vocab LEFT JOIN corp ON corp.b = vocab.b, tot),
            scored AS (SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_feat,
                              SUM(lr.r) AS imp
                       FROM bg JOIN lr ON lr.b = bg.b GROUP BY bg.doc_id)
            SELECT d.doc_id,
                   CAST(COALESCE(s.n_feat, 0) AS BIGINT) AS n_feat,
                   ROUND(COALESCE(s.imp, 0.0), 4) AS importance
            FROM documents d LEFT JOIN scored s ON s.doc_id = d.doc_id
        """,
        # k-token sliding windows via list slicing; dup = exact window-text
        # equality corpus-wide; tokenization is the SAME explicit RE2 class
        # [ \t\r\n]+ the Ray op uses
        "substring_dup_fraction": """
            WITH toks AS (
                SELECT doc_id,
                       regexp_split_to_array(
                           trim(text, ' ' || chr(9) || chr(13) || chr(10)),
                           '[ ' || chr(9) || chr(13) || chr(10) || ']+'
                       ) AS t
                FROM documents),
            win AS (SELECT doc_id, array_to_string(t[i:i+7], ' ') AS w
                    FROM toks, UNNEST(range(1, len(t) - 8 + 2)) AS u(i)),
            d AS (SELECT w FROM win GROUP BY w HAVING count(*) >= 2),
            per AS (SELECT win.doc_id,
                           CAST(count(*) AS BIGINT) AS n_windows,
                           CAST(count(d.w) AS BIGINT) AS n_dup_windows
                    FROM win LEFT JOIN d ON win.w = d.w
                    GROUP BY win.doc_id)
            SELECT toks.doc_id,
                   COALESCE(per.n_windows, 0) AS n_windows,
                   COALESCE(per.n_dup_windows, 0) AS n_dup_windows,
                   CASE WHEN per.n_windows > 0
                        THEN ROUND(CAST(per.n_dup_windows AS DOUBLE) / per.n_windows, 6)
                   END AS dup_fraction
            FROM toks LEFT JOIN per ON per.doc_id = toks.doc_id
        """,
        "paragraph_dedup": """
            WITH split AS (SELECT doc_id, string_split(text, chr(10)||chr(10)) AS l
                           FROM documents),
            p AS (SELECT doc_id, CAST(i AS BIGINT) AS idx, l[i] AS para
                  FROM split, UNNEST(range(1, len(l)+1)) AS t(i)),
            d AS (SELECT para FROM p GROUP BY para HAVING count(*) >= 2),
            m AS (SELECT p.doc_id, p.idx, p.para, d.para IS NOT NULL AS is_dup
                  FROM p LEFT JOIN d ON p.para = d.para)
            SELECT doc_id,
                   count(*) AS n_paras,
                   CAST(count(*) FILTER (WHERE NOT is_dup) AS BIGINT) AS n_kept,
                   string_agg(para, chr(10)||chr(10) ORDER BY idx)
                     FILTER (WHERE NOT is_dup) AS clean_text
            FROM m GROUP BY doc_id
        """,
        # KG degree profile recomputed from the written per-turn edges
        # checkpoint (same source the kg_edges_agg oracle aggregates)
        # exact triangle count over the undirected distinct-pair graph of
        # the written edge checkpoint (a<b<c via the ordered 3-way join)
        "tool_usage": """
            SELECT role, tool, CAST(count(*) AS BIGINT) AS n_turns,
                   CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs
            FROM read_parquet('/tmp/chunksilo_ray_testdata/sf0.01-seed42/transcripts.parquet')
            GROUP BY role, tool
        """,
        "frequent_part_pairs": """
            WITH p AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM p a JOIN p b ON a.l_orderkey = b.l_orderkey
                             AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING count(*) >= 2
        """,
        "proximity_search": """
            WITH toks AS (SELECT doc_id,
                                 regexp_extract_all(lower(text), '[a-z0-9]+') AS t
                          FROM documents),
            pos AS (SELECT doc_id, i, t[i] AS tok
                    FROM toks, UNNEST(range(1, len(t) + 1)) AS u(i)),
            a AS (SELECT doc_id, i FROM pos WHERE tok = 'hash'),
            b AS (SELECT doc_id, i FROM pos WHERE tok = 'join')
            SELECT a.doc_id, CAST(MIN(ABS(a.i - b.i)) AS BIGINT) AS min_dist
            FROM a JOIN b ON a.doc_id = b.doc_id
            GROUP BY a.doc_id
            HAVING MIN(ABS(a.i - b.i)) <= 5
        """,
        "split_assign": """
            SELECT doc_id,
                   CASE substr(md5(text), 1, 1)
                        WHEN 'e' THEN 'val'
                        WHEN 'f' THEN 'test'
                        ELSE 'train' END AS split
            FROM documents
        """,
        "role_transitions": """
            WITH t AS (SELECT conv_id, turn_idx, role,
                              lead(role) OVER (PARTITION BY conv_id
                                               ORDER BY turn_idx) AS nxt
                       FROM read_parquet('/tmp/chunksilo_ray_testdata/sf0.01-seed42/transcripts.parquet'))
            SELECT role AS role_from, nxt AS role_to, CAST(count(*) AS BIGINT) AS n
            FROM t WHERE nxt IS NOT NULL GROUP BY role, nxt
        """,
        "kg_triangle_count": f"""
            WITH agg AS (SELECT DISTINCT subj, obj
                         FROM read_parquet('{_KG_OUT01}/edges/*.parquet')
                         WHERE subj <> obj),
            p AS (SELECT DISTINCT least(subj, obj) AS a, greatest(subj, obj) AS b
                  FROM agg)
            SELECT CAST(count(*) AS BIGINT) AS n_triangles
            FROM p e1
            JOIN p e2 ON e2.a = e1.a AND e2.b > e1.b
            JOIN p e3 ON e3.a = e1.b AND e3.b = e2.b
        """,
        # top-k non-adjacent pairs by neighbor-set Jaccard; raw IEEE double
        # ratios rank identically in both engines (same ints in, one
        # division), ROUND applies to output only
        "kg_common_neighbors": f"""
            WITH agg AS (SELECT DISTINCT subj, obj
                         FROM read_parquet('{_KG_OUT01}/edges/*.parquet')
                         WHERE subj <> obj),
            p AS (SELECT DISTINCT least(subj, obj) AS a, greatest(subj, obj) AS b
                  FROM agg),
            n AS (SELECT a AS node, b AS nb FROM p
                  UNION ALL SELECT b AS node, a AS nb FROM p),
            deg AS (SELECT node, count(*) AS d FROM n GROUP BY node),
            w AS (SELECT n1.nb AS u, n2.nb AS v
                  FROM n n1 JOIN n n2 ON n1.node = n2.node AND n1.nb < n2.nb),
            cnt AS (SELECT u, v, count(*) AS c FROM w GROUP BY u, v),
            nonadj AS (SELECT cnt.u, cnt.v, cnt.c FROM cnt
                       LEFT JOIN p ON p.a = cnt.u AND p.b = cnt.v
                       WHERE p.a IS NULL)
            SELECT u AS node_a, v AS node_b,
                   CAST(c AS BIGINT) AS common_n,
                   ROUND(CAST(c AS DOUBLE) / (da.d + db.d - c), 6) AS jaccard
            FROM nonadj
            JOIN deg da ON da.node = u
            JOIN deg db ON db.node = v
            ORDER BY CAST(c AS DOUBLE) / (da.d + db.d - c) DESC, node_a, node_b
            LIMIT 50
        """,
        "kg_node_degrees": f"""
            WITH agg AS (SELECT subj, pred, obj, CAST(SUM(weight) AS BIGINT) AS weight
                         FROM read_parquet('{_KG_OUT01}/edges/*.parquet')
                         GROUP BY subj, pred, obj),
            u AS (SELECT subj AS node, 1 AS is_out, weight FROM agg
                  UNION ALL SELECT obj, 0, weight FROM agg)
            SELECT node,
                   CAST(SUM(is_out) AS BIGINT) AS out_degree,
                   CAST(SUM(1 - is_out) AS BIGINT) AS in_degree,
                   CAST(SUM(CASE WHEN is_out = 1 THEN weight ELSE 0 END) AS BIGINT) AS w_out,
                   CAST(SUM(CASE WHEN is_out = 0 THEN weight ELSE 0 END) AS BIGINT) AS w_in
            FROM u GROUP BY node
        """,
        # PMI over exact ints: ln(w*T/(wa*wb)) is one division + one ln in
        # both engines (identical IEEE doubles); ROUND(6) on output only —
        # the tfidf_top_terms / bm25 idf precedent
        "kg_edge_pmi": f"""
            WITH p AS (SELECT least(subj, obj) AS a, greatest(subj, obj) AS b,
                              CAST(SUM(weight) AS BIGINT) AS w
                       FROM read_parquet('{_KG_OUT01}/edges/*.parquet')
                       WHERE subj <> obj GROUP BY 1, 2),
            nw AS (SELECT node, SUM(w) AS wn
                   FROM (SELECT a AS node, w FROM p
                         UNION ALL SELECT b, w FROM p)
                   GROUP BY node),
            tot AS (SELECT SUM(w) AS tw FROM p)
            SELECT p.a AS node_a, p.b AS node_b, p.w AS w_pair,
                   ROUND(ln(CAST(p.w AS DOUBLE) * tot.tw / (wa.wn * wb.wn)), 6) AS pmi
            FROM p, tot
            JOIN nw wa ON wa.node = p.a
            JOIN nw wb ON wb.node = p.b
        """,
        "kg_neighbor_agg": f"""
            WITH e AS (SELECT DISTINCT subj, obj
                       FROM read_parquet('{_KG_OUT01}/edges/*.parquet')
                       WHERE subj <> obj),
            p AS (SELECT DISTINCT least(subj, obj) AS a, greatest(subj, obj) AS b
                  FROM e),
            n AS (SELECT a AS node, b AS nb FROM p
                  UNION ALL SELECT b AS node, a AS nb FROM p),
            deg AS (SELECT node, count(*) AS d FROM n GROUP BY node)
            SELECT n.node,
                   CAST(count(*) AS BIGINT) AS degree,
                   CAST(SUM(dd.d) AS BIGINT) AS nd_sum,
                   CAST(MAX(dd.d) AS BIGINT) AS nd_max,
                   ROUND(CAST(SUM(dd.d) AS DOUBLE) / count(*), 6) AS nd_mean
            FROM n JOIN deg dd ON dd.node = n.nb
            GROUP BY n.node
        """,
        "kg_bfs_reach": f"""
            WITH e AS (SELECT DISTINCT subj, obj
                       FROM read_parquet('{_KG_OUT01}/edges/*.parquet')
                       WHERE subj <> obj),
            p AS (SELECT DISTINCT least(subj, obj) AS a, greatest(subj, obj) AS b
                  FROM e),
            n AS (SELECT a AS node, b AS nb FROM p
                  UNION ALL SELECT b AS node, a AS nb FROM p),
            deg AS (SELECT node, count(*) AS d FROM n GROUP BY node),
            seeds AS (SELECT node FROM deg ORDER BY d DESC, node LIMIT 5),
            d1 AS (SELECT DISTINCT n.nb AS node FROM n JOIN seeds s ON n.node = s.node),
            d2 AS (SELECT DISTINCT n.nb AS node FROM n JOIN d1 ON n.node = d1.node),
            d3 AS (SELECT DISTINCT n.nb AS node FROM n JOIN d2 ON n.node = d2.node),
            al AS (SELECT node, 0 AS dist FROM seeds
                   UNION ALL SELECT node, 1 FROM d1
                   UNION ALL SELECT node, 2 FROM d2
                   UNION ALL SELECT node, 3 FROM d3)
            SELECT node, CAST(MIN(dist) AS BIGINT) AS dist
            FROM al GROUP BY node
        """,
        "kg_edge_provenance": f"""
            SELECT subj, pred, obj,
                   CAST(SUM(weight) AS BIGINT) AS weight,
                   CAST(count(*) AS BIGINT) AS n_mentions,
                   MIN(conv_id || ':' || lpad(CAST(turn_idx AS VARCHAR), 6, '0'))
                       AS first_witness
            FROM read_parquet('{_KG_OUT01}/edges/*.parquet')
            GROUP BY subj, pred, obj
        """,
        "sft_pairs": """
            WITH t AS (SELECT conv_id, turn_idx, role, text,
                              lead(role) OVER w AS nr,
                              lead(text) OVER w AS nt,
                              lead(turn_idx) OVER w AS ni
                       FROM read_parquet('/tmp/chunksilo_ray_testdata/sf0.01-seed42/transcripts.parquet')
                       WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx))
            SELECT conv_id, CAST(turn_idx AS BIGINT) AS prompt_turn,
                   text AS prompt, nt AS response
            FROM t
            WHERE role = 'user' AND nr = 'assistant' AND ni = turn_idx + 1
        """,
        "kg_ppr": _kg_ppr_sql(_KG_OUT01),
        "kg_hits": _kg_hits_sql(_KG_OUT01),
        "kg_label_prop": _kg_label_prop_sql(_KG_OUT01),
        # integer-exact weighted sampling: both sides rank by the SAME
        # 60-bit digest // weight integer — no float order anywhere
        "weighted_sample_per_lang": """
            WITH p AS (
                SELECT lang, doc_id,
                       CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                         // GREATEST(n_chars, 1) AS priority
                FROM documents)
            SELECT lang, doc_id, priority FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY lang ORDER BY priority, doc_id) AS rn
                FROM p)
            WHERE rn <= 20
        """,
        # big x big equi-join: 1:N on the transcripts primary key
        "kg_edge_timestamps": f"""
            WITH e AS (SELECT subj, pred, obj, conv_id, turn_idx, weight
                       FROM read_parquet('{_KG_OUT01}/edges/*.parquet')),
            t AS (SELECT conv_id, turn_idx, epoch_us(ts) AS ts_us
                  FROM read_parquet('/tmp/chunksilo_ray_testdata/sf0.01-seed42/transcripts.parquet'))
            SELECT subj, pred, obj,
                   CAST(MIN(ts_us) AS BIGINT) AS first_ts_us,
                   CAST(SUM(weight) AS BIGINT) AS n_mentions
            FROM e JOIN t USING (conv_id, turn_idx)
            GROUP BY subj, pred, obj
        """,
        # hybrid retrieval: both rank lists ROW_NUMBER on the ROUNDED score
        # with an id tie-break (= the Ray op's lexsort), the two RRF terms
        # add in a fixed order -> bit-identical fused doubles
        "hybrid_search_rrf": """
            WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
                          FROM documents),
            stats AS (SELECT COUNT(*) AS n_docs, SUM(len(w)) AS len_sum FROM toks),
            terms AS (SELECT unnest(['data', 'processing', 'pipeline']) AS term),
            tf AS (SELECT doc_id, term, len(list_filter(w, x -> x = term)) AS tf,
                          len(w) AS dl
                   FROM toks CROSS JOIN terms),
            df AS (SELECT term, SUM(CASE WHEN tf > 0 THEN 1 ELSE 0 END) AS df
                   FROM tf GROUP BY term),
            scored AS (
              SELECT doc_id,
                     SUM(LN(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                         * tf * 2.5
                         / (tf + 1.5 * (1 - 0.75 + 0.75 * dl /
                              GREATEST(1.0, CAST(s.len_sum AS DOUBLE)
                                            / GREATEST(1, s.n_docs))))) AS score
              FROM tf JOIN df d USING (term) CROSS JOIN stats s
              WHERE tf > 0 GROUP BY doc_id),
            lex AS (SELECT doc_id, r FROM (
                SELECT doc_id,
                       ROW_NUMBER() OVER (ORDER BY ROUND(score, 6) DESC, doc_id) AS r
                FROM scored WHERE score > 0) WHERE r <= 50),
            dense AS (SELECT vec_id AS doc_id, r FROM (
                SELECT vec_id,
                       ROW_NUMBER() OVER (ORDER BY
                           ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                               (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
                                WHERE vec_id = 0)), 6) DESC, vec_id) AS r
                FROM embeddings) WHERE r <= 50),
            fused AS (SELECT doc_id,
                             COALESCE(1.0 / (60 + l.r), 0)
                               + COALESCE(1.0 / (60 + d.r), 0) AS rrf
                      FROM lex l FULL OUTER JOIN dense d USING (doc_id))
            SELECT doc_id, ROUND(rrf, 6) AS rrf FROM fused
            ORDER BY rrf DESC, doc_id LIMIT 10
        """,
        # hopping windows: each event lands in size/hop = 4 window starts,
        # all integer epoch-microsecond arithmetic
        "hopping_window_counts": """
            WITH e AS (SELECT event_type, epoch_us(ts) AS t FROM events),
            w AS (SELECT event_type,
                         (t // 900000000 - u.k) * 900000000 AS window_start_us
                  FROM e, (SELECT unnest(range(0, 4)) AS k) u)
            SELECT window_start_us, event_type,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM w GROUP BY window_start_us, event_type
        """,
        # the engine's md5-60bit digest partitioner, replayed exactly
        "conv_partition_skew": """
            WITH t AS (SELECT conv_id,
                              CAST(('0x' || substr(md5(conv_id), 1, 15)) AS BIGINT)
                                % 64 AS part,
                              CAST(length(text) AS BIGINT) AS nc
                       FROM read_parquet('/tmp/chunksilo_ray_testdata/sf0.01-seed42/transcripts.parquet'))
            SELECT part,
                   CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs,
                   CAST(count(*) AS BIGINT) AS n_turns,
                   CAST(SUM(nc) AS BIGINT) AS n_chars
            FROM t GROUP BY part
        """,
        "corpus_datasheet": """
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(SUM(length(regexp_extract_all(text, '[A-Za-z0-9]+')))
                     AS BIGINT) AS n_tokens,
                   CAST(SUM(length(text)) AS BIGINT) AS n_chars,
                   CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
                   CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
                   CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct_texts
            FROM documents
        """,
        # as-of forward-fill: latest non-empty tool at or before each turn
        "tool_attribution": """
            SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
                   COALESCE(last_value(CASE WHEN tool <> '' THEN tool END IGNORE NULLS)
                            OVER (PARTITION BY conv_id ORDER BY turn_idx
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                            '') AS last_tool
            FROM read_parquet('/tmp/chunksilo_ray_testdata/sf0.01-seed42/transcripts.parquet')
        """,
        # adjacent user->assistant reply gaps, exact integer microseconds
        "response_latency": """
            WITH s AS (SELECT conv_id, role, ts,
                              lead(role) OVER w AS nrole,
                              lead(ts) OVER w AS nts
                       FROM read_parquet('/tmp/chunksilo_ray_testdata/sf0.01-seed42/transcripts.parquet')
                       WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx))
            SELECT conv_id,
                   CAST(count(*) FILTER (WHERE role = 'user' AND nrole = 'assistant')
                     AS BIGINT) AS n_pairs,
                   CAST(COALESCE(SUM(epoch_us(nts) - epoch_us(ts))
                     FILTER (WHERE role = 'user' AND nrole = 'assistant'), 0)
                     AS BIGINT) AS sum_gap_us,
                   CAST(COALESCE(MAX(epoch_us(nts) - epoch_us(ts))
                     FILTER (WHERE role = 'user' AND nrole = 'assistant'), 0)
                     AS BIGINT) AS max_gap_us
            FROM s GROUP BY conv_id
        """,
        # predicate-distribution entropy: integer weights in, one ln per
        # (subj, pred) group; ROUND(6) + 0.0 normalizes float-sum order and
        # IEEE -0.0 on single-predicate subjects in BOTH engines
        "kg_predicate_entropy": f"""
            WITH a AS (SELECT subj, pred, CAST(SUM(weight) AS BIGINT) AS w
                       FROM read_parquet('{_KG_OUT01}/edges/*.parquet')
                       GROUP BY subj, pred),
            t AS (SELECT subj, SUM(w) AS tw, count(*) AS np FROM a GROUP BY subj)
            SELECT a.subj AS node,
                   CAST(ANY_VALUE(t.np) AS BIGINT) AS n_preds,
                   ROUND(-SUM((a.w * 1.0 / t.tw) * ln(a.w * 1.0 / t.tw)), 6) + 0.0
                     AS pred_entropy
            FROM a JOIN t ON t.subj = a.subj GROUP BY a.subj
        """,
        "role_alternation_audit": """
            WITH s AS (SELECT conv_id, role,
                              lag(role) OVER (PARTITION BY conv_id
                                              ORDER BY turn_idx) AS prev
                       FROM read_parquet('/tmp/chunksilo_ray_testdata/sf0.01-seed42/transcripts.parquet'))
            SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
                   CAST(SUM(CASE WHEN role = prev THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_role_repeats
            FROM s GROUP BY conv_id
        """,
        # last-k-turns truncation: suffix char sums are monotone in reverse
        # turn order, so kept = reverse-prefix; rn = 1 forces the final turn
        "context_window_pack": """
            WITH L AS (SELECT conv_id, turn_idx,
                              CAST(length(text) AS BIGINT) AS n_chars
                       FROM read_parquet('/tmp/chunksilo_ray_testdata/sf0.01-seed42/transcripts.parquet')),
            r AS (SELECT conv_id, turn_idx, n_chars,
                         SUM(n_chars) OVER (PARTITION BY conv_id
                                            ORDER BY turn_idx DESC
                                            ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND CURRENT ROW) AS rc,
                         ROW_NUMBER() OVER (PARTITION BY conv_id
                                            ORDER BY turn_idx DESC) AS rn
                  FROM L)
            SELECT conv_id,
                   CAST(count(*) AS BIGINT) AS n_turns,
                   CAST(count(*) FILTER (WHERE rc <= 400 OR rn = 1) AS BIGINT)
                     AS n_kept,
                   CAST(COALESCE(SUM(n_chars) FILTER (WHERE rc <= 400 OR rn = 1), 0)
                     AS BIGINT) AS chars_kept,
                   CAST(MIN(turn_idx) FILTER (WHERE rc <= 400 OR rn = 1) AS BIGINT)
                     AS start_turn_idx
            FROM r GROUP BY conv_id
        """,
        # Adamic-Adar: integer wedge/degree counts in, ONE ln + division per
        # (pair, deg) group; ROUND(6) absorbs float-sum order, ranking is on
        # the rounded score in BOTH engines
        "kg_adamic_adar": f"""
            WITH agg AS (SELECT DISTINCT subj, obj
                         FROM read_parquet('{_KG_OUT01}/edges/*.parquet')
                         WHERE subj <> obj),
            p AS (SELECT DISTINCT least(subj, obj) AS a, greatest(subj, obj) AS b
                  FROM agg),
            n AS (SELECT a AS node, b AS nb FROM p
                  UNION ALL SELECT b AS node, a AS nb FROM p),
            deg AS (SELECT node, count(*) AS d FROM n GROUP BY node),
            w AS (SELECT n1.nb AS u, n2.nb AS v, dm.d AS dz
                  FROM n n1 JOIN n n2 ON n1.node = n2.node AND n1.nb < n2.nb
                  JOIN deg dm ON dm.node = n1.node),
            sc AS (SELECT u, v, CAST(count(*) AS BIGINT) AS c,
                          SUM(1.0 / ln(dz)) AS s
                   FROM w GROUP BY u, v),
            nonadj AS (SELECT sc.u, sc.v, sc.c, sc.s FROM sc
                       LEFT JOIN p ON p.a = sc.u AND p.b = sc.v
                       WHERE p.a IS NULL)
            SELECT u AS node_a, v AS node_b, c AS common_n,
                   ROUND(s, 6) AS adamic_adar
            FROM nonadj
            ORDER BY ROUND(s, 6) DESC, node_a, node_b
            LIMIT 50
        """,
        "kg_random_walks": _kg_walks_sql(_KG_OUT01),
        "kg_component_sizes": _kg_csize_sql(_KG_OUT01),
        "error_turn_fraction": _flagged_turns_sql(
            "/tmp/chunksilo_ray_testdata/sf0.01-seed42/transcripts.parquet"
        ),
        "prompt_prefix_dedup": _prompt_dedup_sql(
            "/tmp/chunksilo_ray_testdata/sf0.01-seed42/transcripts.parquet"
        ),
        "fuzzy_name_matches": """
            WITH rep AS (SELECT lower(p_name) AS name, MIN(p_partkey) AS pk
                         FROM part GROUP BY 1),
            tri AS (SELECT DISTINCT r.pk, substr(r.name, t.i, 3) AS tri
                    FROM rep r,
                         LATERAL (SELECT unnest(generate_series(
                             1, GREATEST(length(r.name) - 2, 1))) AS i) t),
            sizes AS (SELECT pk, COUNT(*) AS n FROM tri GROUP BY 1),
            common AS (SELECT a.pk AS pk1, b.pk AS pk2, COUNT(*) AS inter
                       FROM tri a JOIN tri b
                         ON a.tri = b.tri AND a.pk < b.pk GROUP BY 1, 2)
            SELECT pk1, pk2, inter,
                   sa.n + sb.n - inter AS uni,
                   ROUND(inter * 1.0 / (sa.n + sb.n - inter), 6) AS jac
            FROM common
            JOIN sizes sa ON sa.pk = pk1
            JOIN sizes sb ON sb.pk = pk2
            WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5
        """,
        "cube_orders": """
            SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
                   o_orderpriority,
                   ROUND(SUM(o_totalprice), 2) AS revenue,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders
            GROUP BY CUBE (order_year, o_orderpriority)
        """,
        "full_outer_daily_activity": """
            WITH o AS (SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
                              CAST(COUNT(*) AS BIGINT) AS n_orders,
                              ROUND(SUM(o_totalprice), 2) AS revenue
                       FROM orders GROUP BY 1),
            e AS (SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
                         CAST(COUNT(*) AS BIGINT) AS n_events
                  FROM events GROUP BY 1)
            SELECT COALESCE(o.day, e.day) AS day, o.n_orders, o.revenue,
                   e.n_events
            FROM o FULL OUTER JOIN e ON o.day = e.day
        """,
        "mad_value_by_type": """
            WITH m AS (SELECT event_type, MEDIAN(value) AS med
                       FROM events GROUP BY 1),
            d AS (SELECT e.event_type, ANY_VALUE(m.med) AS med,
                         MEDIAN(ABS(e.value - m.med)) AS mad
                  FROM events e JOIN m USING (event_type) GROUP BY 1)
            SELECT d.event_type,
                   ROUND(ANY_VALUE(d.med), 6) AS median_value,
                   ROUND(ANY_VALUE(d.mad), 6) AS mad,
                   CAST(SUM(CASE WHEN ABS(e.value - d.med)
                                      > 3 * 1.4826 * d.mad
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
            FROM events e JOIN d USING (event_type)
            GROUP BY 1
        """,
        "bpe_pair_counts": """
            WITH pairs AS (
              SELECT substr(d.text, t.i, 2) AS pair
              FROM documents d,
                   LATERAL (SELECT unnest(generate_series(
                       1, GREATEST(length(d.text) - 1, 0))) AS i) t
            ),
            c AS (SELECT pair, CAST(COUNT(*) AS BIGINT) AS n FROM pairs
                  WHERE NOT regexp_matches(pair, '[ \t\n\r]') GROUP BY pair)
            SELECT pair, n FROM c ORDER BY n DESC, pair LIMIT 50
        """,
        "kg_edge_lifespan": f"""
            WITH e AS (SELECT subj, pred, obj, conv_id, turn_idx, weight
                       FROM read_parquet('{_KG_OUT01}/edges/*.parquet')),
            t AS (SELECT conv_id, turn_idx, epoch_us(ts) AS ts_us
                  FROM read_parquet('/tmp/chunksilo_ray_testdata/sf0.01-seed42/transcripts.parquet'))
            SELECT subj, pred, obj,
                   CAST(MIN(ts_us) AS BIGINT) AS first_ts_us,
                   CAST(MAX(ts_us) AS BIGINT) AS last_ts_us,
                   CAST(MAX(ts_us) - MIN(ts_us) AS BIGINT) AS span_us,
                   CAST(SUM(weight) AS BIGINT) AS n_mentions
            FROM e JOIN t USING (conv_id, turn_idx)
            GROUP BY subj, pred, obj
        """,
        "kg_schema_profile": f"""
            SELECT pred,
                   CAST(COUNT(*) AS BIGINT) AS n_triples,
                   CAST(SUM(weight) AS BIGINT) AS total_weight,
                   CAST(COUNT(DISTINCT subj) AS BIGINT) AS n_subj,
                   CAST(COUNT(DISTINCT obj) AS BIGINT) AS n_obj
            FROM read_parquet('{_KG_OUT01}/edges_agg/*.parquet')
            GROUP BY pred
        """,
        "qa_length_correlation": """
            WITH t AS (SELECT conv_id, turn_idx, role, length(text) AS len
                       FROM read_parquet('/tmp/chunksilo_ray_testdata/sf0.01-seed42/transcripts.parquet')),
            p AS (SELECT CAST(a.len AS BIGINT) AS x, CAST(b.len AS BIGINT) AS y
                  FROM t a JOIN t b
                    ON b.conv_id = a.conv_id AND b.turn_idx = a.turn_idx + 1
                  WHERE a.role = 'user' AND b.role = 'assistant'),
            mom AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                           CAST(SUM(x) AS DOUBLE) AS sx,
                           CAST(SUM(y) AS DOUBLE) AS sy,
                           CAST(SUM(x*x) AS DOUBLE) AS sxx,
                           CAST(SUM(y*y) AS DOUBLE) AS syy,
                           CAST(SUM(x*y) AS DOUBLE) AS sxy
                    FROM p)
            SELECT ROUND((n*sxy - sx*sy)
                         / (SQRT(n*sxx - sx*sx) * SQRT(n*syy - sy*sy)), 6)
                     AS qa_len_corr,
                   CAST(n AS BIGINT) AS n_pairs
            FROM mom
        """,
        "conv_tool_chains": """
            WITH tt AS (SELECT conv_id, turn_idx, tool,
                               ROW_NUMBER() OVER (PARTITION BY conv_id
                                                  ORDER BY turn_idx) AS rn
                        FROM read_parquet('/tmp/chunksilo_ray_testdata/sf0.01-seed42/transcripts.parquet')
                        WHERE role = 'tool'),
            chains AS (SELECT conv_id,
                              string_agg(tool, '>' ORDER BY turn_idx) AS chain
                       FROM tt WHERE rn <= 12 GROUP BY conv_id),
            c AS (SELECT chain, CAST(COUNT(*) AS BIGINT) AS n_convs
                  FROM chains GROUP BY chain)
            SELECT chain, n_convs FROM c ORDER BY n_convs DESC, chain LIMIT 50
        """,
        "kg_extraction_yield": f"""
            WITH t AS (SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_turns
                       FROM read_parquet('/tmp/chunksilo_ray_testdata/sf0.01-seed42/transcripts.parquet')
                       GROUP BY conv_id),
            e AS (SELECT conv_id, CAST(SUM(weight) AS BIGINT) AS n_mentions
                  FROM read_parquet('{_KG_OUT01}/edges/*.parquet')
                  GROUP BY conv_id),
            y AS (SELECT t.conv_id,
                         LEAST(10 * COALESCE(e.n_mentions, 0) // t.n_turns, 50)
                           AS yield_bucket
                  FROM t LEFT JOIN e USING (conv_id))
            SELECT yield_bucket, CAST(COUNT(*) AS BIGINT) AS n_convs
            FROM y GROUP BY yield_bucket
        """,
        "kg_path_census": f"""
            WITH ea AS (SELECT subj, pred, obj
                        FROM read_parquet('{_KG_OUT01}/edges_agg/*.parquet'))
            SELECT e1.pred AS pred1, e2.pred AS pred2,
                   CAST(COUNT(*) AS BIGINT) AS n_paths
            FROM ea e1 JOIN ea e2 ON e2.subj = e1.obj
            GROUP BY e1.pred, e2.pred
        """,
        "kg_reciprocity": f"""
            WITH p AS (SELECT subj, pred, obj
                       FROM read_parquet('{_KG_OUT01}/edges_agg/*.parquet')
                       WHERE subj <> obj)
            SELECT p.pred,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(COUNT(r.subj) AS BIGINT) AS n_recip,
                   ROUND(CAST(COUNT(r.subj) AS DOUBLE) / COUNT(*), 6) + 0.0
                     AS recip_rate
            FROM p LEFT JOIN p r
              ON r.pred = p.pred AND r.subj = p.obj AND r.obj = p.subj
            GROUP BY p.pred
        """,
        "kg_star_query": f"""
            SELECT subj, CAST(COUNT(*) AS BIGINT) AS n_objs
            FROM read_parquet('{_KG_OUT01}/edges_agg/*.parquet')
            WHERE pred IN ('asks_about', 'states', 'configures')
            GROUP BY subj
            HAVING COUNT(DISTINCT pred) = 3
        """,
        "first_tool_distribution": """
            WITH ft AS (SELECT conv_id, tool,
                               ROW_NUMBER() OVER (PARTITION BY conv_id
                                                  ORDER BY turn_idx) AS rn
                        FROM read_parquet('/tmp/chunksilo_ray_testdata/sf0.01-seed42/transcripts.parquet')
                        WHERE role = 'tool'),
            convs AS (SELECT DISTINCT conv_id
                      FROM read_parquet('/tmp/chunksilo_ray_testdata/sf0.01-seed42/transcripts.parquet'))
            SELECT COALESCE(ft.tool, '<none>') AS first_tool,
                   CAST(COUNT(*) AS BIGINT) AS n_convs
            FROM convs LEFT JOIN ft
              ON ft.conv_id = convs.conv_id AND ft.rn = 1
            GROUP BY first_tool
        """,
        "order_size_histogram": """
            WITH per_order AS (SELECT l_orderkey, COUNT(*) AS n_items
                               FROM lineitem GROUP BY l_orderkey)
            SELECT CAST(n_items AS BIGINT) AS n_items,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM per_order GROUP BY n_items
        """,
        "turn_volume_weekly": """
            SELECT CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS week,
                   role,
                   CAST(COUNT(*) AS BIGINT) AS n_turns,
                   CAST(SUM(length(text)) AS BIGINT) AS total_chars
            FROM read_parquet('/tmp/chunksilo_ray_testdata/sf0.01-seed42/transcripts.parquet')
            GROUP BY week, role
        """,
        "top_users_profile": """
            WITH ut AS (SELECT user_id, event_type,
                               CAST(COUNT(*) AS BIGINT) AS n,
                               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                                      AS BIGINT) AS cents
                        FROM events GROUP BY user_id, event_type),
            u AS (SELECT user_id, SUM(n) AS n_events, SUM(cents) AS total_cents
                  FROM ut GROUP BY user_id),
            d AS (SELECT user_id, event_type AS top_type,
                         ROW_NUMBER() OVER (PARTITION BY user_id
                                            ORDER BY n DESC, event_type) AS rn
                  FROM ut)
            SELECT u.user_id,
                   CAST(n_events AS BIGINT) AS n_events,
                   CAST(total_cents AS BIGINT) AS total_cents,
                   d.top_type
            FROM u JOIN d USING (user_id) WHERE d.rn = 1
            ORDER BY total_cents DESC, u.user_id LIMIT 20
        """,
        "conversion_within_window": """
            WITH s AS (SELECT user_id, MIN(epoch_us(ts)) AS s_ts
                       FROM events WHERE event_type = 'signup'
                       GROUP BY user_id),
            c AS (SELECT DISTINCT s.user_id
                  FROM s JOIN events p
                    ON p.user_id = s.user_id
                   AND p.event_type = 'purchase'
                   AND epoch_us(p.ts) > s.s_ts
                   AND epoch_us(p.ts) <= s.s_ts + 604800000000)
            SELECT CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS n_signup_users,
                   CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_converted
        """,
        "kg_alias_coverage": f"""
            WITH nodes AS (SELECT subj AS node
                           FROM read_parquet('{_KG_OUT01}/edges_agg/*.parquet')
                           UNION
                           SELECT obj
                           FROM read_parquet('{_KG_OUT01}/edges_agg/*.parquet')),
            known AS (SELECT DISTINCT entity_id, entity_type
                      FROM read_parquet('/tmp/chunksilo_ray_testdata/sf0.01-seed42/alias_index.parquet'))
            SELECT entity_type,
                   CAST(COUNT(*) AS BIGINT) AS n_known,
                   CAST(SUM(CASE WHEN nodes.node IS NOT NULL THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_in_graph
            FROM known LEFT JOIN nodes ON nodes.node = known.entity_id
            GROUP BY entity_type
        """,
        "kg_type_signature": f"""
            SELECT pred,
                   COALESCE(NULLIF(split_part(subj, ':', 1), subj), 'untyped')
                     AS subj_type,
                   COALESCE(NULLIF(split_part(obj, ':', 1), obj), 'untyped')
                     AS obj_type,
                   CAST(COUNT(*) AS BIGINT) AS n_triples,
                   CAST(SUM(weight) AS BIGINT) AS total_weight
            FROM read_parquet('{_KG_OUT01}/edges_agg/*.parquet')
            GROUP BY pred, subj_type, obj_type
        """,
        "segment_priority_chi2": """
            WITH c AS (SELECT cu.c_mktsegment AS segment,
                              o.o_orderpriority AS priority,
                              CAST(COUNT(*) AS DOUBLE) AS n
                       FROM orders o
                       JOIN customer cu ON cu.c_custkey = o.o_custkey
                       GROUP BY segment, priority),
            st AS (SELECT segment, SUM(n) AS sn FROM c GROUP BY segment),
            pt AS (SELECT priority, SUM(n) AS pn FROM c GROUP BY priority),
            tot AS (SELECT SUM(n) AS t FROM c)
            SELECT ROUND(SUM((n - sn * pn / t) * (n - sn * pn / t)
                             / (sn * pn / t)), 6) AS chi2,
                   CAST((SELECT COUNT(*) - 1 FROM st)
                        * (SELECT COUNT(*) - 1 FROM pt) AS BIGINT) AS dof,
                   CAST(t AS BIGINT) AS n_orders
            FROM c JOIN st USING (segment) JOIN pt USING (priority)
                 CROSS JOIN tot
            GROUP BY t
        """,
        "kg_evidence_text": f"""
            WITH prov AS (SELECT subj, pred, obj,
                                 CAST(SUM(weight) AS BIGINT) AS weight,
                                 MIN(conv_id || ':' ||
                                     lpad(CAST(turn_idx AS VARCHAR), 6, '0'))
                                   AS first_witness
                          FROM read_parquet('{_KG_OUT01}/edges/*.parquet')
                          GROUP BY subj, pred, obj),
            top AS (SELECT * FROM prov
                    ORDER BY weight DESC, subj, pred, obj LIMIT 100),
            t AS (SELECT conv_id || ':' ||
                         lpad(CAST(turn_idx AS VARCHAR), 6, '0') AS first_witness,
                         text AS evidence
                  FROM read_parquet('/tmp/chunksilo_ray_testdata/sf0.01-seed42/transcripts.parquet'))
            SELECT subj, pred, obj, weight, first_witness, evidence
            FROM top JOIN t USING (first_witness)
        """,
        "media_dup_groups": f"""
            WITH f AS (SELECT media_id,
                              substr(md5(lower(hex(payload))), 1, 16) AS content_md5
                       FROM read_parquet('{_MEDIA_DUP_PQ}'))
            SELECT content_md5,
                   CAST(COUNT(*) AS BIGINT) AS n_assets,
                   MIN(media_id) AS min_media_id
            FROM f GROUP BY content_md5 HAVING COUNT(*) > 1
        """,
        "kg_entity_card": f"""
            WITH ea AS (SELECT subj, pred, obj, weight
                        FROM read_parquet('{_KG_OUT01}/edges_agg/*.parquet'))
            SELECT 'out' AS direction, pred, obj AS other,
                   CAST(weight AS BIGINT) AS weight
            FROM ea WHERE subj = 'tool:bash'
            UNION ALL
            SELECT 'in', pred, subj, CAST(weight AS BIGINT)
            FROM ea WHERE obj = 'tool:bash'
            ORDER BY direction, pred, other
        """,
        "kg_ego_subgraph": f"""
            WITH ea AS (SELECT subj, pred, obj, weight
                        FROM read_parquet('{_KG_OUT01}/edges_agg/*.parquet')),
            n1 AS (SELECT obj AS e FROM ea WHERE subj = 'tool:bash'
                   UNION
                   SELECT subj FROM ea WHERE obj = 'tool:bash'
                   UNION
                   SELECT 'tool:bash')
            SELECT subj, pred, obj, CAST(weight AS BIGINT) AS weight
            FROM ea
            WHERE subj IN (SELECT e FROM n1) OR obj IN (SELECT e FROM n1)
        """,
        "conv_entity_richness": f"""
            WITH m AS (SELECT conv_id, subj AS entity, weight
                       FROM read_parquet('{_KG_OUT01}/edges/*.parquet')
                       UNION ALL
                       SELECT conv_id, obj, weight
                       FROM read_parquet('{_KG_OUT01}/edges/*.parquet')),
            c AS (SELECT conv_id,
                         COUNT(DISTINCT entity) AS n_entities,
                         SUM(weight) // 2 AS n_mentions
                  FROM m GROUP BY conv_id)
            SELECT conv_id,
                   CAST(n_entities AS BIGINT) AS n_entities,
                   CAST(n_mentions AS BIGINT) AS n_mentions
            FROM c ORDER BY n_entities DESC, conv_id LIMIT 50
        """,
        "kg_edge_confidence": f"""
            SELECT subj, pred, obj, CAST(weight AS BIGINT) AS weight,
                   ROUND(CAST(weight AS DOUBLE)
                         / SUM(weight) OVER (PARTITION BY subj, pred), 6)
                     + 0.0 AS confidence
            FROM read_parquet('{_KG_OUT01}/edges_agg/*.parquet')
        """,
        "lang_source_crosstab": """
            SELECT lang,
                   CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS n_src0,
                   CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS n_src1,
                   CAST(SUM(CASE WHEN source = 'src10' THEN 1 ELSE 0 END) AS BIGINT) AS n_src10,
                   CAST(SUM(CASE WHEN source = 'src11' THEN 1 ELSE 0 END) AS BIGINT) AS n_src11,
                   CAST(SUM(CASE WHEN source = 'src12' THEN 1 ELSE 0 END) AS BIGINT) AS n_src12,
                   CAST(SUM(CASE WHEN source = 'src13' THEN 1 ELSE 0 END) AS BIGINT) AS n_src13,
                   CAST(SUM(CASE WHEN source = 'src14' THEN 1 ELSE 0 END) AS BIGINT) AS n_src14,
                   CAST(SUM(CASE WHEN source = 'src15' THEN 1 ELSE 0 END) AS BIGINT) AS n_src15,
                   CAST(SUM(CASE WHEN source = 'src16' THEN 1 ELSE 0 END) AS BIGINT) AS n_src16,
                   CAST(SUM(CASE WHEN source = 'src17' THEN 1 ELSE 0 END) AS BIGINT) AS n_src17,
                   CAST(SUM(CASE WHEN source = 'src18' THEN 1 ELSE 0 END) AS BIGINT) AS n_src18,
                   CAST(SUM(CASE WHEN source = 'src19' THEN 1 ELSE 0 END) AS BIGINT) AS n_src19,
                   CAST(SUM(CASE WHEN source = 'src2' THEN 1 ELSE 0 END) AS BIGINT) AS n_src2,
                   CAST(SUM(CASE WHEN source = 'src3' THEN 1 ELSE 0 END) AS BIGINT) AS n_src3,
                   CAST(SUM(CASE WHEN source = 'src4' THEN 1 ELSE 0 END) AS BIGINT) AS n_src4,
                   CAST(SUM(CASE WHEN source = 'src5' THEN 1 ELSE 0 END) AS BIGINT) AS n_src5,
                   CAST(SUM(CASE WHEN source = 'src6' THEN 1 ELSE 0 END) AS BIGINT) AS n_src6,
                   CAST(SUM(CASE WHEN source = 'src7' THEN 1 ELSE 0 END) AS BIGINT) AS n_src7,
                   CAST(SUM(CASE WHEN source = 'src8' THEN 1 ELSE 0 END) AS BIGINT) AS n_src8,
                   CAST(SUM(CASE WHEN source = 'src9' THEN 1 ELSE 0 END) AS BIGINT) AS n_src9,
                   CAST(COUNT(*) AS BIGINT) AS n_total
            FROM documents GROUP BY lang
        """,
        "q6_revenue_filtered": """
            SELECT ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                             * CAST(ROUND(l_discount * 100) AS BIGINT))
                         / 10000.0, 4) AS revenue,
                   CAST(COUNT(*) AS BIGINT) AS n_items
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND CAST(ROUND(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
              AND l_quantity < 24
        """,
        "event_type_bigrams": """
            WITH s AS (SELECT user_id, event_type,
                              LEAD(event_type) OVER (PARTITION BY user_id
                                                     ORDER BY ts, event_id)
                                AS next_type
                       FROM events)
            SELECT event_type AS t1, next_type AS t2,
                   CAST(COUNT(*) AS BIGINT) AS n_bigrams
            FROM s WHERE next_type IS NOT NULL
            GROUP BY t1, t2
        """,
        "partitioned_export_roundtrip": f"""
            WITH per_subj AS (SELECT pred, subj,
                                     SUM(weight) AS w, COUNT(*) AS n
                              FROM read_parquet('{_KG_OUT01}/edges_agg/*.parquet')
                              GROUP BY pred, subj)
            SELECT pred,
                   CAST(SUM(n) AS BIGINT) AS n_triples,
                   CAST(SUM(w) AS BIGINT) AS total_weight,
                   CAST(COUNT(*) AS BIGINT) AS n_subjects
            FROM per_subj GROUP BY pred
        """,
        # revenue accumulates as int64 cents x discount-percent on BOTH
        # engines; the single final division makes the float deterministic
        "q5_revenue_by_nation": """
            SELECT n.n_name AS n_name,
                   ROUND(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                             * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
                         / 10000.0, 4) AS revenue
            FROM lineitem l
            JOIN orders o   ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n   ON n.n_nationkey = s.s_nationkey
                           AND c.c_nationkey = s.s_nationkey
            JOIN region r   ON r.r_regionkey = n.n_regionkey
            WHERE r.r_name = 'ASIA'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n.n_name
        """,
        "echo_rate_histogram": """
            WITH t AS (SELECT conv_id, turn_idx, role,
                              list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')) AS toks
                       FROM read_parquet('/tmp/chunksilo_ray_testdata/sf0.01-seed42/transcripts.parquet')),
            p AS (SELECT a.toks AS ta, b.toks AS tb
                  FROM t a JOIN t b
                    ON b.conv_id = a.conv_id AND b.turn_idx = a.turn_idx + 1
                  WHERE a.role = 'user' AND b.role = 'assistant'),
            j AS (SELECT CAST(len(list_intersect(ta, tb)) AS BIGINT) AS ni,
                         CAST(len(list_distinct(list_concat(ta, tb))) AS BIGINT) AS nu
                  FROM p)
            SELECT CAST(10 * ni // nu AS BIGINT) AS echo_bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM j WHERE nu > 0 GROUP BY echo_bucket
        """,
        "cohort_retention": """
            WITH a AS (SELECT DISTINCT user_id,
                              CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS week
                       FROM events),
            f AS (SELECT user_id, MIN(week) AS cohort_week FROM a GROUP BY user_id)
            SELECT f.cohort_week,
                   a.week - f.cohort_week AS offset_weeks,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM a JOIN f USING (user_id)
            GROUP BY f.cohort_week, offset_weeks
        """,
        "readability_scores": """
            WITH s AS (SELECT doc_id,
                              CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_words,
                              GREATEST(CAST(len(regexp_extract_all(lower(text), '[.!?]+')) AS BIGINT), 1) AS n_sentences,
                              CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables
                       FROM documents)
            SELECT doc_id, n_words, n_sentences, n_syllables,
                   ROUND(206.835
                         - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                         - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 4)
                     + 0.0 AS flesch
            FROM s WHERE n_words > 0
        """,
        "kg_pred_confusion": f"""
            WITH ea AS (SELECT subj, pred, obj
                        FROM read_parquet('{_KG_OUT01}/edges_agg/*.parquet'))
            SELECT e1.pred AS pred1, e2.pred AS pred2,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM ea e1 JOIN ea e2
              ON e2.subj = e1.subj AND e2.obj = e1.obj AND e1.pred < e2.pred
            GROUP BY e1.pred, e2.pred
        """,
        # additivity equivalence: incremental merge(base_agg, delta) must
        # equal the one-shot aggregate of ALL per-mention edges
        "kg_incremental_update": f"""
            SELECT subj, pred, obj, CAST(SUM(weight) AS BIGINT) AS weight
            FROM read_parquet('{_KG_OUT01}/edges/*.parquet')
            GROUP BY subj, pred, obj
        """,
        "transcript_sessionize": """
            WITH t AS (SELECT conv_id, turn_idx, epoch_us(ts) AS ts_us
                       FROM read_parquet('/tmp/chunksilo_ray_testdata/sf0.01-seed42/transcripts.parquet')),
            l AS (SELECT conv_id, turn_idx,
                         CASE WHEN LAG(ts_us) OVER w IS NULL
                                OR ts_us - LAG(ts_us) OVER w > 1800000000
                              THEN 1 ELSE 0 END AS new_sess
                  FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)),
            s AS (SELECT conv_id,
                         SUM(new_sess) OVER (PARTITION BY conv_id
                                             ORDER BY turn_idx) AS sess
                  FROM l),
            c AS (SELECT conv_id, sess, COUNT(*) AS n_turns
                  FROM s GROUP BY conv_id, sess)
            SELECT CAST(n_turns AS BIGINT) AS session_turns,
                   CAST(COUNT(*) AS BIGINT) AS n_sessions
            FROM c GROUP BY n_turns
        """,
        "turn_integrity_audit": """
            WITH c AS (SELECT conv_id,
                              COUNT(*) AS n,
                              COUNT(DISTINCT turn_idx) AS nd,
                              MIN(turn_idx) AS mn, MAX(turn_idx) AS mx
                       FROM read_parquet('/tmp/chunksilo_ray_testdata/sf0.01-seed42/transcripts.parquet')
                       GROUP BY conv_id)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_convs,
                   CAST(SUM(CASE WHEN nd < n THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_dup_idx,
                   CAST(SUM(CASE WHEN mx - mn + 1 <> nd THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_gapped,
                   CAST(SUM(CASE WHEN mn <> 0 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_nonzero_start
            FROM c
        """,
        "kg_temporal_growth": f"""
            WITH e AS (SELECT subj, pred, obj, conv_id, turn_idx
                       FROM read_parquet('{_KG_OUT01}/edges/*.parquet')),
            t AS (SELECT conv_id, turn_idx, epoch_us(ts) AS ts_us
                  FROM read_parquet('/tmp/chunksilo_ray_testdata/sf0.01-seed42/transcripts.parquet')),
            f AS (SELECT subj, pred, obj, MIN(ts_us) AS first_ts_us
                  FROM e JOIN t USING (conv_id, turn_idx)
                  GROUP BY subj, pred, obj)
            SELECT CAST(first_ts_us // 86400000000 AS BIGINT) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_new_triples
            FROM f GROUP BY day
        """,
        "kg_entity_roles": f"""
            WITH ea AS (SELECT subj, pred, obj
                        FROM read_parquet('{_KG_OUT01}/edges_agg/*.parquet')),
            u AS (SELECT pred, e, MAX(is_s) AS is_s, MAX(is_o) AS is_o FROM (
                    SELECT DISTINCT pred, subj AS e, 1 AS is_s, 0 AS is_o FROM ea
                    UNION ALL
                    SELECT DISTINCT pred, obj AS e, 0, 1 FROM ea)
                  GROUP BY pred, e)
            SELECT pred,
                   CAST(SUM(is_s) AS BIGINT) AS n_subjects,
                   CAST(SUM(is_o) AS BIGINT) AS n_objects,
                   CAST(SUM(is_s * is_o) AS BIGINT) AS n_both
            FROM u GROUP BY pred
        """,
        "kg_degree_histogram": f"""
            WITH ea AS (SELECT subj, obj
                        FROM read_parquet('{_KG_OUT01}/edges_agg/*.parquet')),
            d AS (SELECT node, CAST(SUM(o) + SUM(i) AS BIGINT) AS degree FROM (
                    SELECT subj AS node, COUNT(*) AS o, 0 AS i FROM ea GROUP BY subj
                    UNION ALL
                    SELECT obj, 0, COUNT(*) FROM ea GROUP BY obj)
                  GROUP BY node)
            SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
            FROM d GROUP BY degree
        """,
        "tool_latency_profile": """
            WITH t AS (SELECT conv_id, turn_idx, role, tool, epoch_us(ts) AS ts_us
                       FROM read_parquet('/tmp/chunksilo_ray_testdata/sf0.01-seed42/transcripts.parquet'))
            SELECT b.tool,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(b.ts_us - a.ts_us) AS BIGINT) AS sum_gap_us,
                   CAST(MAX(b.ts_us - a.ts_us) AS BIGINT) AS max_gap_us
            FROM t a JOIN t b
              ON b.conv_id = a.conv_id AND b.turn_idx = a.turn_idx + 1
            WHERE a.role = 'assistant' AND b.role = 'tool'
            GROUP BY b.tool
        """,
        "role_trigrams": """
            WITH t AS (SELECT conv_id, turn_idx, role
                       FROM read_parquet('/tmp/chunksilo_ray_testdata/sf0.01-seed42/transcripts.parquet'))
            SELECT a.role AS r1, b.role AS r2, c.role AS r3,
                   CAST(COUNT(*) AS BIGINT) AS n_trigrams
            FROM t a
            JOIN t b ON b.conv_id = a.conv_id AND b.turn_idx = a.turn_idx + 1
            JOIN t c ON c.conv_id = a.conv_id AND c.turn_idx = a.turn_idx + 2
            GROUP BY a.role, b.role, c.role
        """,
        # exact integer moment sums on both engines, identical final float
        # formula -> bit-identical r before the shared ROUND
        "kg_degree_assortativity": f"""
            WITH ea AS (SELECT subj, obj
                        FROM read_parquet('{_KG_OUT01}/edges_agg/*.parquet')),
            d AS (
              SELECT node, SUM(c) AS deg FROM (
                SELECT subj AS node, COUNT(*) AS c FROM ea GROUP BY 1
                UNION ALL
                SELECT obj AS node, COUNT(*) AS c FROM ea GROUP BY 1
              ) GROUP BY node
            ),
            pairs AS (
              SELECT CAST(ds.deg AS BIGINT) AS x, CAST(do_.deg AS BIGINT) AS y
              FROM ea JOIN d ds ON ds.node = ea.subj
                      JOIN d do_ ON do_.node = ea.obj
              UNION ALL
              SELECT CAST(do_.deg AS BIGINT), CAST(ds.deg AS BIGINT)
              FROM ea JOIN d ds ON ds.node = ea.subj
                      JOIN d do_ ON do_.node = ea.obj
            ),
            mom AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                           CAST(SUM(x) AS DOUBLE) AS sx,
                           CAST(SUM(y) AS DOUBLE) AS sy,
                           CAST(SUM(x*x) AS DOUBLE) AS sxx,
                           CAST(SUM(y*y) AS DOUBLE) AS syy,
                           CAST(SUM(x*y) AS DOUBLE) AS sxy
                    FROM pairs)
            SELECT ROUND((n*sxy - sx*sy)
                         / (SQRT(n*sxx - sx*sx) * SQRT(n*syy - sy*sy)), 6)
                   AS assortativity
            FROM mom
        """,
        # roundtrip oracles read the ORIGINAL tables (not the exported
        # files) — parity proves the interchange lost nothing
        "jsonl_roundtrip_transcripts": """
            SELECT role, CAST(count(*) AS BIGINT) AS n_turns,
                   CAST(SUM(length(text)) AS BIGINT) AS total_chars,
                   CAST(MAX(turn_idx) AS BIGINT) AS max_turn_idx
            FROM read_parquet('/tmp/chunksilo_ray_testdata/sf0.01-seed42/transcripts.parquet')
            GROUP BY role
        """,
        "csv_roundtrip_events": """
            SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
                   CAST(MIN(event_id) AS BIGINT) AS min_event_id,
                   CAST(MAX(event_id) AS BIGINT) AS max_event_id,
                   CAST(SUM(user_id) AS BIGINT) AS sum_user_id
            FROM events GROUP BY event_type
        """,
        "kg_negative_samples": f"""
            WITH p AS (SELECT DISTINCT least(subj, obj) AS a, greatest(subj, obj) AS b
                       FROM read_parquet('{_KG_OUT01}/edges/*.parquet')
                       WHERE subj <> obj),
            v AS (SELECT node, ROW_NUMBER() OVER (ORDER BY node) - 1 AS rn
                  FROM (SELECT a AS node FROM p UNION SELECT b FROM p)),
            n AS (SELECT count(*) AS c FROM v),
            cand AS (SELECT p.a, p.b,
                            CAST(('0x' || substr(md5(p.a || '|' || p.b), 1, 8)) AS BIGINT)
                                % n.c AS idx
                     FROM p, n),
            neg AS (SELECT cand.a AS seed_a, cand.b AS seed_b, v.node AS corrupt
                    FROM cand JOIN v ON v.rn = cand.idx
                    WHERE v.node <> cand.a AND v.node <> cand.b),
            np AS (SELECT seed_a, seed_b,
                          least(seed_a, corrupt) AS neg_a,
                          greatest(seed_a, corrupt) AS neg_b
                   FROM neg)
            SELECT np.seed_a, np.seed_b, np.neg_a, np.neg_b
            FROM np LEFT JOIN p ON p.a = np.neg_a AND p.b = np.neg_b
            WHERE p.a IS NULL
        """,
        "conv_dedup": """
            WITH h AS (SELECT conv_id,
                              md5(string_agg(text, chr(31) ORDER BY turn_idx))
                                  AS conv_sha
                       FROM read_parquet('/tmp/chunksilo_ray_testdata/sf0.01-seed42/transcripts.parquet')
                       GROUP BY conv_id),
            g AS (SELECT conv_sha, MIN(conv_id) AS rep, count(*) AS n
                  FROM h GROUP BY conv_sha)
            SELECT h.conv_id, h.conv_sha, g.rep AS rep_conv_id,
                   CAST(g.n AS BIGINT) AS group_size
            FROM h JOIN g USING (conv_sha)
        """,
        "turn_length_percentiles": """
            SELECT role,
                   CAST(count(*) AS BIGINT) AS n_turns,
                   CAST(MIN(length(text)) AS BIGINT) AS len_min,
                   CAST(quantile_disc(length(text), 0.50) AS BIGINT) AS p50,
                   CAST(quantile_disc(length(text), 0.90) AS BIGINT) AS p90,
                   CAST(quantile_disc(length(text), 0.99) AS BIGINT) AS p99,
                   CAST(MAX(length(text)) AS BIGINT) AS len_max
            FROM read_parquet('/tmp/chunksilo_ray_testdata/sf0.01-seed42/transcripts.parquet')
            GROUP BY role
        """,
        "conv_loop_score": """
            SELECT conv_id,
                   CAST(count(*) AS BIGINT) AS n_turns,
                   CAST(count(DISTINCT substr(md5(text), 1, 16)) AS BIGINT)
                       AS n_distinct,
                   ROUND(1 - CAST(count(DISTINCT substr(md5(text), 1, 16)) AS DOUBLE)
                             / count(*), 6) AS loop_score
            FROM read_parquet('/tmp/chunksilo_ray_testdata/sf0.01-seed42/transcripts.parquet')
            GROUP BY conv_id
        """,
        "conv_stats": """
            SELECT conv_id,
                   CAST(count(*) AS BIGINT) AS n_turns,
                   CAST(SUM(CASE WHEN tool <> '' THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_tool_turns,
                   CAST(SUM(length(text)) AS BIGINT) AS total_chars,
                   CAST(MAX(length(text)) AS BIGINT) AS max_turn_chars,
                   CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) AS duration_us
            FROM read_parquet('/tmp/chunksilo_ray_testdata/sf0.01-seed42/transcripts.parquet')
            GROUP BY conv_id
        """,
    }
