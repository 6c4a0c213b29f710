"""Sources: corpus loaders and the CDC-style change feed."""
