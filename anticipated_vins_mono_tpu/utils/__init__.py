"""Config, datasets, metrics, timing, checkpointing, logging."""
