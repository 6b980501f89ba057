"""Cross-chip parallelism: image-tile sharding over a TPU mesh."""
