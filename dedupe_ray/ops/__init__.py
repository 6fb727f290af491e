"""Operator library beyond the core ER pipeline.

- tabular: app-surface parity ops (column-mapped union, anti-join export,
  semi-join recovery, previews) — SURVEY §2.A.
- text: language-ID, quality scoring, token counting, fingerprinting.
- dedup: exact / MinHash-LSH / SimHash / n-gram-Jaccard deduplication.
- embedding: brute-force + LSH-bucketed cosine similarity search, near-dup.
- multimodal: media decode/feature plumbing (decode stubbed — no codecs in
  this environment).
"""
