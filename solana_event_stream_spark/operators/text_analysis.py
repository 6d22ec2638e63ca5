"""Text analysis (lang-id, quality scoring, token counting,
fingerprinting) — filled in milestone 3."""
