"""Utilities: checkpointing, weight conversion, logging, plotting."""
