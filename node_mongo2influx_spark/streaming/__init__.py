"""Structured Streaming variant of the migrate pipeline."""
