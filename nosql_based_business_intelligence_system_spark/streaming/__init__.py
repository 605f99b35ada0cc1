"""Structured Streaming facet — the batch expressions reused under
``readStream`` with watermarks and event-time windows."""
