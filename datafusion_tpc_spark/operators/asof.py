"""Placeholder — filled in M5."""
