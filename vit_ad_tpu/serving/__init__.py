"""Serving-side subsystem: AOT-compiled scoring artifacts (serving/aot.py)."""
