"""Framework utilities: checkpointing, logging, streaming."""
