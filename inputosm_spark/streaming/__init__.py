"""Structured Streaming layer (OSC change streams, windowed aggs)."""
