"""Training/evaluation pipeline: jit step functions, metrics, sweeps."""
