"""Scalar/aggregate function surface: cleaning rules, dates, text, vectors."""
