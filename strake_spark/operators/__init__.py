"""Distributed data-pipeline operators beyond the reference's surface.

The reference explicitly defers distributed shuffle compute
(docs/architecture.md:91-92); these operators are where Spark's cluster
execution pays off: dedup (exact / MinHash-LSH / SimHash / n-gram
Jaccard / embedding cosine / SemDeDup), similarity search (brute /
LSH / IVF / PQ), text analysis + ranking (BM25, tf-idf) + importance
weighting (DSIR), URL canonicalization, and multimodal column
plumbing with REAL jar-free codecs (PNG decode/encode/resize, WAV/PCM
audio, the JVM image + binaryFile sources) — each designed as
shuffle-lean DataFrame pipelines that hold up at 100 TB.
"""
