"""extract_kit_ray — a Ray-Data-native document/web-text extraction engine.

A from-scratch rebuild of the *capabilities* of aidalinfo/extract-kit
(reference at /root/reference, TypeScript/Bun) as idiomatic Ray Data
pipelines: every stage is ``Dataset.map_batches`` over Arrow batches,
stateful stages are actor pools, wide steps are ``groupby``/``aggregate``.

Layout
------
- ``functions/``  pure, deterministic per-batch kernels (no Ray imports)
- ``stages/``     Ray Data stage wrappers (callable classes for actor pools)
- ``pipelines/``  end-to-end pipelines (flagship extraction, lineage, resume)
- ``ops/``        large-scale data ops (dedup, similarity, text analysis)
- ``schemas.py``  pyarrow schemas + JSON-Schema compiler (Zod-equivalent)
- ``fixtures.py`` deterministic synthetic page corpus generator

Nothing in this package calls ``ray.init()`` — sessions are owned by the
driver / bench / test fixture.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy re-exports of the public API (keeps import light for Ray
    workers that only need one stage)."""
    _API = {
        "extract_pages": ("extract_kit_ray.pipelines.flagship", "extract_pages"),
        "read_pages": ("extract_kit_ray.pipelines.flagship", "read_pages"),
        "HtmlExtractor": ("extract_kit_ray.stages.extract_stage", "HtmlExtractor"),
        "SchemaValidator": ("extract_kit_ray.stages.validate_stage", "SchemaValidator"),
        "extract_layout_fanout": ("extract_kit_ray.stages.pdf_stage", "extract_layout_fanout"),
        "lineage_rollup": ("extract_kit_ray.pipelines.lineage", "lineage_rollup"),
        "run_partitioned_extract": ("extract_kit_ray.pipelines.resume", "run_partitioned_extract"),
        "read_extracted": ("extract_kit_ray.pipelines.resume", "read_extracted"),
        "extract_document": ("extract_kit_ray.functions.extract", "extract_document"),
        "compile_json_schema": ("extract_kit_ray.schemas", "compile_json_schema"),
        "exact_dedup": ("extract_kit_ray.ops.dedup", "exact_dedup"),
        "minhash_lsh_dedup": ("extract_kit_ray.ops.dedup", "minhash_lsh_dedup"),
        "brute_force_topk": ("extract_kit_ray.ops.similarity", "brute_force_topk"),
        "lsh_topk": ("extract_kit_ray.ops.similarity", "lsh_topk"),
        "ivf_topk": ("extract_kit_ray.ops.similarity", "ivf_topk"),
    }
    try:
        mod_name, attr = _API[name]
    except KeyError:
        raise AttributeError(f"module 'extract_kit_ray' has no attribute {name!r}") from None
    import importlib

    return getattr(importlib.import_module(mod_name), attr)
