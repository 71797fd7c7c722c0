"""DataFrame->DataFrame operator library (the engine's query layer)."""
