"""Streaming: bounded-drain micro-batch replay with exactly-once commits."""
