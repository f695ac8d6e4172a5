"""Shared utilities: profiling, throughput accounting."""
