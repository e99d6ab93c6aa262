"""Job-level option validation (SURVEY.md M23): the reference's Zod
request schema (packages/pdf-processor/src/api/validation.ts:21-47)
re-expressed as plan-time config validation — enums, ranged numbers,
defaults.  Runs once at pipeline build, never per row.
"""

from __future__ import annotations

PROVIDERS = ("scaleway", "ollama", "mistral", "custom")
DOCUMENT_TYPES = ("invoice", "receipt", "basic", "custom")
MAX_PDF_BYTES = 50 * 1024 * 1024  # validation.ts:57-59

_DEFAULTS = {
    "provider": "scaleway",
    "query": "*",
    "tablesOnly": False,
    "enhanceContrast": True,
    "targetQuality": 95,
    "debug": False,
}


def validate_extract_options(options: dict | None) -> tuple[bool, str | None, dict | None]:
    """Validate + default an extract-options dict.

    Returns (valid, error, data) — the reference's
    ``validateExtractRequest`` contract.  Checks (validation.ts:21-30):
    provider/documentType enums, cropSize in [10, 100], targetQuality in
    [70, 100], boolean flags, string model/query."""
    opts = dict(options or {})
    out = dict(_DEFAULTS)

    def fail(msg: str) -> tuple[bool, str, None]:
        return False, msg, None

    provider = opts.pop("provider", out["provider"])
    if provider not in PROVIDERS:
        return fail(f"provider must be one of {PROVIDERS}, got {provider!r}")
    out["provider"] = provider

    if "model" in opts:
        model = opts.pop("model")
        if not isinstance(model, str):
            return fail("model must be a string")
        out["model"] = model

    query = opts.pop("query", out["query"])
    if not isinstance(query, str):
        return fail("query must be a string")
    out["query"] = query

    if "cropSize" in opts:
        crop = opts.pop("cropSize")
        if isinstance(crop, bool) or not isinstance(crop, (int, float)):
            return fail("cropSize must be a number")
        if not (10 <= crop <= 100):
            return fail(f"cropSize must be in [10, 100], got {crop}")
        out["cropSize"] = crop

    if "documentType" in opts:
        dt = opts.pop("documentType")
        if dt not in DOCUMENT_TYPES:
            return fail(f"documentType must be one of {DOCUMENT_TYPES}, got {dt!r}")
        out["documentType"] = dt

    quality = opts.pop("targetQuality", out["targetQuality"])
    if isinstance(quality, bool) or not isinstance(quality, (int, float)):
        return fail("targetQuality must be a number")
    if not (70 <= quality <= 100):
        return fail(f"targetQuality must be in [70, 100], got {quality}")
    out["targetQuality"] = quality

    for flag in ("tablesOnly", "enhanceContrast", "debug"):
        val = opts.pop(flag, out[flag])
        if not isinstance(val, bool):
            return fail(f"{flag} must be a boolean")
        out[flag] = val

    if opts:
        return fail(f"unknown options: {sorted(opts)}")
    return True, None, out


def pool_config_from_env(env=None) -> dict:
    """Env-var pool sizing (SURVEY.md U7; the reference's EK_PDF_WORKERS /
    EK_VISION_WORKERS surface, worker-manager.ts:45-55 +
    example.env.development:9-10):

    - ``EKRAY_EXTRACT_WORKERS``: extraction actor-pool concurrency
      (default: cluster CPUs - 2, resolved at plan time)
    - ``EKRAY_VISION_WORKERS``: media/vision actor-pool concurrency
      (default 2, the reference's PDF-worker default)
    - ``EKRAY_BATCH_SIZE``: extraction batch size (default 64)

    Invalid values fail loudly at plan time, mirroring the Zod env
    parse, never mid-pipeline."""
    import os

    env = os.environ if env is None else env
    out = {"extract_workers": None, "vision_workers": 2, "batch_size": 64}
    for key, name in (("EKRAY_EXTRACT_WORKERS", "extract_workers"),
                      ("EKRAY_VISION_WORKERS", "vision_workers"),
                      ("EKRAY_BATCH_SIZE", "batch_size")):
        raw = env.get(key)
        if raw is None:
            continue
        try:
            val = int(raw)
        except ValueError:
            raise ValueError(f"{key} must be an integer, got {raw!r}") from None
        if val < 1:
            raise ValueError(f"{key} must be >= 1, got {val}")
        out[name] = val
    return out


def broadcast_max_rows(env=None) -> int:
    """Size guard for driver-side broadcast lookup tables (dup-cluster
    maps, candidate key sets, label maps).  Below the threshold the
    operator collects the small side and broadcasts it into a
    ``map_batches`` filter (one streaming pass, no shuffle); above it
    the operator falls back to a distributed ``Dataset.join`` /
    anti-join so the driver never holds an unbounded frame — web-corpus
    duplicate volume is NOT small (30-50% of documents), so every
    "bounded by dup volume" broadcast needs this escape hatch.

    Default 2M rows (~50 MB of int64 keys + dict overhead); override
    with ``EKRAY_BROADCAST_MAX_ROWS``."""
    import os

    env = os.environ if env is None else env
    raw = env.get("EKRAY_BROADCAST_MAX_ROWS")
    if raw is None:
        return 2_000_000
    try:
        val = int(raw)
    except ValueError:
        raise ValueError(
            f"EKRAY_BROADCAST_MAX_ROWS must be an integer, got {raw!r}"
        ) from None
    if val < 0:
        raise ValueError(f"EKRAY_BROADCAST_MAX_ROWS must be >= 0, got {val}")
    return val


def lsh_bucket_cap(env=None) -> int:
    """Per-(band, hash) bucket member cap for LSH / SimHash candidate
    expansion (``ops/dedup._expand_member_pairs``).  A degenerate bucket
    — a crawl slice of identical cookie-banner boilerplate hashing 10^6
    keys into one band bucket — would otherwise expand to 10^12 pairs in
    a single task.  Above the cap, expansion switches to a hash-sampled
    core + star edges (O(cap^2 + n) output, connectivity preserved,
    ``overflow`` audit column set).

    Default 512 (core expansion <= ~131k pairs/bucket); override with
    ``EKRAY_LSH_BUCKET_CAP``; 0 disables the cap."""
    import os

    env = os.environ if env is None else env
    raw = env.get("EKRAY_LSH_BUCKET_CAP")
    if raw is None:
        return 512
    try:
        val = int(raw)
    except ValueError:
        raise ValueError(
            f"EKRAY_LSH_BUCKET_CAP must be an integer, got {raw!r}"
        ) from None
    if val < 0:
        raise ValueError(f"EKRAY_LSH_BUCKET_CAP must be >= 0, got {val}")
    return val


def default_num_partitions(env=None) -> int:
    """Join/shuffle partition default DERIVED FROM THE CLUSTER instead
    of a hardcoded constant (round-4 verdict #4): half the total
    cluster CPUs (floor 8), so a 256-node run doesn't funnel its joins
    through 8 aggregators while the per-partition FIXED cost stays
    paid-for.  Measured (BASELINE.md round 5): Ray's hash-shuffle join
    spins up aggregator actors per partition, and on the narrow
    decision shuffles the cost is ~linear in the partition count at
    test scale — dedup_paragraphs at sf0.1 runs 9.5 s with 8
    partitions, ~11 s with 16-32, ~20 s with 64 (the old 2x-CPUs
    default) — so the multiplier is cpus/2, not 2x cpus; a petabyte
    exchange that wants more parallelism than cores/2 sets
    ``EKRAY_NUM_PARTITIONS`` explicitly.  Reads live
    ``ray.cluster_resources()`` when a session exists (the driver's
    ``ray.init`` happens before any query runs), else
    ``os.cpu_count()``."""
    import os

    env = os.environ if env is None else env
    raw = env.get("EKRAY_NUM_PARTITIONS")
    if raw is not None:
        try:
            val = int(raw)
        except ValueError:
            raise ValueError(
                f"EKRAY_NUM_PARTITIONS must be an integer, got {raw!r}"
            ) from None
        if val < 1:
            raise ValueError(f"EKRAY_NUM_PARTITIONS must be >= 1, got {val}")
        return val
    cpus = None
    try:
        import ray

        if ray.is_initialized():
            cpus = ray.cluster_resources().get("CPU")
    except Exception:
        cpus = None
    if not cpus:
        cpus = os.cpu_count() or 4
    return max(8, int(cpus) // 2)


def resolve_num_partitions(num_partitions: int | None, env=None) -> int:
    """``None`` -> :func:`default_num_partitions`; explicit values pass
    through (callers that know their exchange is tiny keep their 2/4)."""
    return default_num_partitions(env) if num_partitions is None else int(num_partitions)


def validate_pdf_payload(payload: bytes, filename: str = "") -> tuple[bool, str | None]:
    """The upload gate (validation.ts:52-64): must look like a PDF (magic
    or .pdf name) and stay under 50 MB."""
    if not (payload[:4] == b"%PDF" or filename.lower().endswith(".pdf")):
        return False, "file must be a PDF"
    if len(payload) > MAX_PDF_BYTES:
        return False, "PDF file must not exceed 50MB"
    return True, None
