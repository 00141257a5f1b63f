"""Stateless ``map_batches`` stages over zero-copy Arrow batches."""
