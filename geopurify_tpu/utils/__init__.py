"""Metrics, checkpointing, logging, profiling utilities."""
