"""map_batches stage callables (fetch simulation, extraction, gates)."""
