"""Structured Streaming ingestion (the DCP-stream role)."""
