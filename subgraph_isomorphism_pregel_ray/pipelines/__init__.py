"""Pipelines: graph build, BSP driver, algorithms, training-data operators."""
