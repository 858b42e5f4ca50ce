"""Table layouts and sinks."""
