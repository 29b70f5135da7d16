"""Composed end-to-end pipelines (north-rule flows)."""
