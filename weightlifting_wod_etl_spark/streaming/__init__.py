"""Structured-streaming flavors of the stateful operators."""
