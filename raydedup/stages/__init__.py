"""map_batches / groupby stages — each is a named Dataset → Dataset function."""
