"""Streaming operators: incremental ingest of new files into the dedup state."""
