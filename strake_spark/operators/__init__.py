"""Distributed data-pipeline operators beyond the reference's surface.

The reference explicitly defers distributed shuffle compute
(docs/architecture.md:91-92); these operators are where Spark's cluster
execution pays off: dedup (exact / MinHash-LSH / SimHash / n-gram
Jaccard / embedding cosine), similarity search, text analysis, and
multimodal column plumbing — each designed as shuffle-lean DataFrame
pipelines that hold up at 100 TB.
"""
