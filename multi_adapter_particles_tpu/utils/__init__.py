"""Utility layer: timers, CLI parsing, checkpointing, metrics."""
