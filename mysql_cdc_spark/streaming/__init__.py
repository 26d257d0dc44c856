"""Structured Streaming runtime for the CDC engine (see runtime.py)."""
