"""Compute ops: transforms, quantization, entropy-stage primitives."""
