"""Operators: relationship detection, hierarchy traversal, dedup,
similarity search, text analysis, multimodal plumbing."""
