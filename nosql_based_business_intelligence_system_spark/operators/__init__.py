"""Composed DataFrame -> DataFrame operators: star joins, reference
aggregates, top-k, dedup, similarity search."""
