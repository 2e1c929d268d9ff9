"""Relational + pipeline operators: cleaning, dedup, transform, warehouse, analytics."""
