"""Training-data / analytics operators over Ray Datasets.

- ``torray.ops.listops``   — small exact-list helpers mirrored from the
  reference util layer (J4/D2/D3 in SURVEY.md §2).
- ``torray.ops.dedup``     — exact / MinHash-LSH / SimHash / n-gram
  Jaccard / embedding-cosine deduplication.
- ``torray.ops.text``      — language-ID, quality scoring, token
  counting, document fingerprinting.
- ``torray.ops.similarity``— brute-force + LSH-bucketed ANN over an
  embedding column.
- ``torray.ops.multimodal``— binary-column decode/feature plumbing
  (decoders stubbed; Ray-side schema/actor plumbing real).
"""
