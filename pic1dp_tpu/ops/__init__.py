"""Compute ops: interpolation, deposition, gather, spectral field solve."""
