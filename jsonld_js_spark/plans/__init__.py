"""Lineage, checkpoint manifests, resumable execution."""
