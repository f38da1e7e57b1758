"""markdown_lab_ray — a Ray-Data-native crawl-and-convert engine.

From-scratch re-implementation of the capabilities of
ursisterbtw/markdown_lab (reference at /root/reference, read-only) as an
idiomatic Ray Data pipeline: URL frontier + fetch scheduler with
approximate-membership URL-seen sharding, per-host politeness,
HTML -> Document -> Markdown/JSON/XML conversion and RAG chunking as
zero-copy Arrow ``map_batches`` stages, plus large-scale training-data
operators (dedup, similarity search, text analysis, image plumbing).

Nothing in here calls ``ray.init``/``ray.shutdown``; sessions are owned
by the driver, ``bench.py`` and the test fixture.
"""

__version__ = "0.1.0"
