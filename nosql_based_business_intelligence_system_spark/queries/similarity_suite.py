"""Placeholder suite (filled in this round)."""

QUERIES: dict = {}
