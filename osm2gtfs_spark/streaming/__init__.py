"""Structured Streaming surface (north-rule scale ops; reference is batch-only)."""
