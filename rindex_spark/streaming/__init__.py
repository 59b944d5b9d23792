"""Structured Streaming integration."""
