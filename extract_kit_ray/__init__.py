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
