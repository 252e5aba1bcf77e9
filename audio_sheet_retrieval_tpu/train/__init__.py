"""Training engine: jitted train step, early stopping, refinement schedule."""
