"""Structured Streaming twins of the batch temporal operators."""
