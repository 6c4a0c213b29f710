"""Scalar/vectorized functions: tokenizer, posting codec, BM25 math, hashing."""
