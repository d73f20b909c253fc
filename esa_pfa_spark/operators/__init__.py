"""Operator library: as-of joins, windows, features, pairing, dedup,
similarity, text stats, multimodal plumbing."""
