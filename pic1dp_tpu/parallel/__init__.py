"""Parallelism: device mesh, particle-axis sharding, collective step."""
