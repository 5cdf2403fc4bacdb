"""Utilities: metrics, image IO, profiling/tracing."""
