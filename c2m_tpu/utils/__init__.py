"""Host-side utilities: flow colorization, visualization, checkpointing."""
