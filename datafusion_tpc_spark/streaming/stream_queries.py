"""Placeholder — filled in M4."""
