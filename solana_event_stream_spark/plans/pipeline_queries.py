"""Catalog entries for the Solana event pipeline (SURVEY §2) — filled in
as the pipeline lands (fixtures + golden oracle parquet)."""
