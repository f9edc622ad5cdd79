"""Engine operators.

- ``relational``  top-k per group, deterministic dedup, rare-value
  handling, sessionization (SURVEY §2.4/§2.5 generalised)
- ``asof``        as-of / range joins (absent in stock Spark)
- ``dedup``       exact + MinHash-LSH + SimHash + n-gram Jaccard +
  embedding near-dup (north-star LLM-pipeline surface)
- ``similarity``  ANN over embedding columns (brute-force + LSH path)
- ``text``        tokenisation, language-ID, quality scoring, token
  counting, document fingerprinting
- ``cleaning``    the ORDerly clean pipeline (SURVEY §3.2) on the
  array-model reaction schema
- ``multimodal``  binary-column decode/feature plumbing (decoders
  stubbed; Spark-side schema/batching real)
"""
