"""Deduplication operators (exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine) — filled in milestone 3."""
