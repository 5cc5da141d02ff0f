"""Deterministic entity catalog for the synthetic transcript corpus.

The catalog is the ground truth for the alias index (FIXTURES.md §2) and the
template slots used by :mod:`chunksilo_ray.datagen`. Known entities have alias
surface variants; "unknown families" are entity surfaces deliberately left out
of the alias index so the canonicalization stage (MinHash-LSH + verify) has
real work to do — their variants share character shingles.
"""

from __future__ import annotations

from .functions.textutils import normalize_surface

PERSONS: list[str] = [
    "Alice", "Bob", "Carol", "Dave", "Erin",
    "Frank", "Grace", "Heidi", "Ivan", "Judy",
]

# primary surface -> alias variants (all map to the same entity)
SYSTEMS: dict[str, list[str]] = {
    "database": ["db", "data-base", "DataBase"],
    "cache": ["redis-cache", "RedisCache"],
    "auth-service": ["auth", "authservice", "AuthService"],
    "api-gateway": ["gateway", "ApiGateway"],
    "scheduler": ["cron-scheduler", "CronScheduler"],
    "search-index": ["searchindex", "SearchIndex"],
    "message-queue": ["mq", "MessageQueue"],
    "blob-storage": ["storage", "BlobStorage"],
    "web-frontend": ["frontend", "WebFrontend"],
    "backend": ["BackendService", "backend-service"],
}

TOOLS: dict[str, list[str]] = {
    "bash": [],
    "search": [],
    "edit": [],
    "python": [],
    "browser": [],
    "grep": [],
}

ARTIFACTS: dict[str, list[str]] = {
    "config.yaml": ["ConfigYaml"],
    "DATABASE_URL": ["database-url"],
    "requirements.txt": [],
    "ci-pipeline": ["CiPipeline"],
    "Dockerfile": ["docker-file"],
    "README.md": ["readme"],
    "setup.sh": [],
    "api-keys": ["ApiKeys"],
}

# unknown entity families: list of surface variants per family; NOT in the
# alias index — the canonicalizer must merge the variants (char-shingle
# jaccard chains >= 0.6 within a family by construction, transitively).
# Every variant is Capitalized or contains a delimiter so the mention
# candidate rules (rules.py spec, rule 1) can detect it.
UNKNOWN_FAMILIES: list[list[str]] = [
    ["Flumetrics", "flu-metrics", "Flumetric"],
    ["Zorpdash", "zorp-dash", "Zorpdashes"],
    ["Quanticore", "quanti-core", "Quanticores"],
    ["Webhookery", "web-hookery", "Webhookeries"],
    ["Signalforge", "signal-forge", "Signalforges"],
    ["Datamunger", "data-munger", "Datamungers"],
    ["Logshrike", "log-shrike", "Logshrikes"],
    ["Metricowl", "metric-owl", "Metricowls"],
    ["Cachewarmer", "cache-warmer", "Cachewarmers"],
    ["Tokenizery", "tokenizer-y", "Tokenizeries"],
    ["Vectorbarn", "vector-barn", "Vectorbarns"],
    ["Shardling", "shard-ling", "Shardlings"],
    ["Queuepilot", "queue-pilot", "Queuepilots"],
    ["Dedupmatic", "dedup-matic", "Dedupmatics"],
    ["Parquetizer", "parquet-izer", "Parquetizers"],
]

# ID-like mentions ("proj 1234" / "proj_1234" / "PROJ-1234") are unified by
# normalize_surface's ID rule before canonicalization even runs. Many
# prefixes + a wide number range keep shingle-neighborhoods (and thus
# near-dup cluster sizes) small at every scale.
TICKET_PREFIXES: list[str] = [
    "proj", "ops", "data", "infra", "core", "plat",
    "net", "sec", "perf", "build", "test", "rel",
]

# distractor aliases that never occur in transcripts (precision fixture)
DISTRACTORS: list[str] = [f"ghost-system-{i:02d}" for i in range(50)]


def entity_id(kind: str, primary: str) -> str:
    return f"{kind}:{normalize_surface(primary)}"


def build_alias_rows() -> list[dict]:
    """Alias-index rows: (alias, entity_id, entity_type). Includes every
    surface variant of every known entity + distractors."""
    rows: list[dict] = []

    def add(kind: str, primary: str, variants: list[str]) -> None:
        eid = entity_id(kind, primary)
        for surf in [primary, *variants]:
            rows.append({"alias": surf, "entity_id": eid, "entity_type": kind})

    for p in PERSONS:
        add("person", p, [])
    for primary, variants in SYSTEMS.items():
        add("system", primary, variants)
    for primary, variants in TOOLS.items():
        add("tool", primary, variants)
    for primary, variants in ARTIFACTS.items():
        add("artifact", primary, variants)
    for d in DISTRACTORS:
        add("system", d, [])
    return rows
