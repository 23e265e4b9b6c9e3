"""Training-data pipeline operations over the transcript/document tables:
deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
cosine), similarity search (brute-force + LSH-bucketed ANN), text analysis
(language-ID, quality scores, token counts, fingerprinting), and multimodal
column plumbing.

Design rules (the 100 TB contract):
- everything is a DataFrame plan over built-in pyspark.sql.functions —
  higher-order array functions (transform/aggregate/filter) keep token- and
  shingle-level math JVM-side with zero Python in the hot path;
- candidate generation is always hash-bucketed (LSH bands, hyperplane
  buckets) so the pairwise phase never does an O(n²) cross join at scale;
  brute-force variants exist as correctness baselines and for small sides;
- all pseudo-randomness (minhash seeds, hyperplanes) is derived from
  deterministic integer hashing, so results are reproducible at any
  parallelism and never ship RNG state to executors.
"""

from beats_spark.ml import dedup, multimodal, similarity, textstats  # noqa: F401
