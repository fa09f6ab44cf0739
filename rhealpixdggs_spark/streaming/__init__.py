"""Structured-streaming rollups (per-cell windowed counts)."""
