"""End-to-end plan assemblies (reference-parity pipeline, flagship queries)."""
