"""Structured Streaming jobs over the events log (reference WAL analog)."""
