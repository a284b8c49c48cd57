"""Streaming host<->device runtime: pipeline, tracing, journal."""
