"""Data layer: on-device synthetic pair generation + host-side datasets."""
