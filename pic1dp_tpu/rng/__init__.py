"""Random number generation: jax.random streams + multirand-compatible engines."""
