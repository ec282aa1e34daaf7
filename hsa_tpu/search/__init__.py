"""Batched device search engines (jnp reference paths + Pallas fast paths)."""
