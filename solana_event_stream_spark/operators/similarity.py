"""Similarity search (brute-force cosine top-k, LSH/IVF scale path) —
filled in milestone 3."""
