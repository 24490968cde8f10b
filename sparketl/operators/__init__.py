"""Operator modules: relational (reference parity) + ext (LLM-pipeline)."""
