"""Operator library: transforms, dedup, similarity, text analysis, multimodal."""
