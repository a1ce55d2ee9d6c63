"""Fixed-size contact ring buffer with random overwrite.

TPU-native analog of the reference's `ContactBuffer`
(`utils/contact_buffer.py:5-42`): a fixed-capacity tensor buffer that fills
sequentially and, once full, overwrites a random contiguous slot range with
each new batch. The reference mutates a torch tensor on the host; here the
buffer is a pure pytree updated with `lax.dynamic_update_slice`, so inserts
can run inside a jitted rollout (e.g. accumulating fingertip contact points
for the ContactSLAMer belief state) with static shapes and no host sync.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class ContactBufferState(NamedTuple):
    buffer: jnp.ndarray  # (capacity, content_dim)
    top: jnp.ndarray  # scalar int32 — valid rows (saturates at capacity)


def create(capacity: int, content_dim: int = 3) -> ContactBufferState:
    return ContactBufferState(
        buffer=jnp.zeros((capacity, content_dim), dtype=jnp.float32),
        top=jnp.int32(0),
    )


def insert(state: ContactBufferState, batch: jnp.ndarray, key: jnp.ndarray) -> ContactBufferState:
    """Insert a (B, content_dim) batch.

    Semantics of the reference insert (`utils/contact_buffer.py:15-35`):
    - while not full: append at `top`;
    - spill-over (and every insert once full): write at a uniformly random
      start position in [0, capacity - B].

    JAX note: both cases are computed as one `dynamic_update_slice` whose
    start index is `top` while filling and random after; a batch that
    straddles the boundary is placed at the random position in full (the
    reference splits it — one array op here keeps the shape static, the
    reservoir statistics are equivalent).
    """
    capacity = state.buffer.shape[0]
    b = batch.shape[0]
    if b > capacity:
        raise ValueError(f"batch ({b}) larger than buffer capacity ({capacity})")
    rand_pos = jax.random.randint(key, (), 0, capacity - b + 1)
    seq_pos = jnp.minimum(state.top, capacity - b)
    fits = state.top + b <= capacity
    pos = jnp.where(fits, seq_pos, rand_pos)
    new_buf = jax.lax.dynamic_update_slice(
        state.buffer, batch.astype(state.buffer.dtype), (pos, jnp.int32(0))
    )
    new_top = jnp.minimum(state.top + b, capacity)
    return ContactBufferState(new_buf, new_top.astype(jnp.int32))


def contents(state: ContactBufferState) -> np.ndarray:
    """Host copy of the valid rows (reference `print`/`save`)."""
    return np.asarray(state.buffer)[: int(state.top)]


def save(state: ContactBufferState, path: str) -> None:
    np.save(path, contents(state))
