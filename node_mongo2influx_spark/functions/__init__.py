"""Reusable Column-expression builders (hashing, vectors, text)."""
