"""Streaming support: broker-free harness + event-time operators."""
