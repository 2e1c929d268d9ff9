"""Structured Streaming jobs sharing the batch cleaning expression library."""
