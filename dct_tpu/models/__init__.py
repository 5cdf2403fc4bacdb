"""Codec models: end-to-end encode/decode pipelines (grayscale, color, video)."""
