"""Distributed execution: device meshes, index sharding, multi-host init."""

from .mesh import ShardedIndex, make_mesh  # noqa: F401
