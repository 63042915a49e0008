"""Data layer: meta frames, datasets/loaders, and text frontends."""
