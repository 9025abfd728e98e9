"""Scalar-function layer: cross-engine deterministic hashing, the
reference's multi-format date parser re-expressed as Catalyst
expressions, Lua-pattern translation, and text metrics."""
