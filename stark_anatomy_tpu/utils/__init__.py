"""Shared utilities: canonical encodings, profiling."""
