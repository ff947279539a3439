"""Benchmark harnesses (roofline + scaling efficiency)."""
