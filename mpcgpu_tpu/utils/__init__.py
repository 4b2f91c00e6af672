"""Experiment utilities: stats, CSV IO, reference trajectory loading."""
