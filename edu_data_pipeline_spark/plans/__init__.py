"""Plan inspection helpers (explain/pushdown/broadcast assertions for tests)."""
