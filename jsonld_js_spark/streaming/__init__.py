"""Incremental / streaming ingest."""
