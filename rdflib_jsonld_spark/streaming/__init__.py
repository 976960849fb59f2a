"""Structured Streaming frontend for incremental KG construction."""
