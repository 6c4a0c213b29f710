"""Pipeline operators: dispatch/mapping, dedup family, batching, text
analysis, similarity search."""
