"""Placeholder — filled in M2."""
