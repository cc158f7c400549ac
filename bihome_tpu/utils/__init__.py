"""Misc utilities: local weight cache, visualization."""
