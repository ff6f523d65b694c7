"""Placeholder — filled in by the operators milestone."""
