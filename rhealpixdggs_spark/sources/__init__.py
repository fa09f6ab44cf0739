"""Input sources: deterministic synthetic pages table, snapshot
manifests (Iceberg-semantics emulation on Parquet)."""
