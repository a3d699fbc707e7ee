"""nise_dedup — a from-scratch PySpark-native near-duplicate detection and
clustering engine over source-code corpora.

Reimagines the hashing-based near-dup search ideas of the reference
(`liujie8/nise`; checkout empty in this sandbox — see SURVEY.md §0) as a
batch, resumable, shuffle-disciplined Spark pipeline per BASELINE.json:

    ingest → signatures (k-shingle MinHash + 64-bit SimHash, vectorized
    pandas/Arrow UDFs) → LSH band hashing (salted against hot-bucket skew)
    → candidate pairs → verification (Hamming / exact Jaccard /
    suffix-array LCS cascade) → iterative connected components → clusters

Blueprint: SURVEY.md §2 (operator inventory) / §7 (build plan).
"""

from nise_dedup.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
