"""Core device math, RNG, and SoA pytree types."""
