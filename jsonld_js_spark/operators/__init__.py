"""Spark DataFrame operators over the triples/transcripts tables."""
