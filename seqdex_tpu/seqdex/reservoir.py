"""Terminal-state reservoirs — the chain's inter-stage handoff.

TPU-native replacement for the reference's pickled terminal-state files
(Search saves per-lego-type heap states + hand dofs when >= 5000 collected,
`search.py:1304-1355`; Orient/GraspSim re-save "good" states,
`orient.py:1462-1515`, `grasp_sim.py:1399-1458`; successors sample them at
reset, `grasp_sim.py:412-415`, `insert_sim.py:372-375,1448-1455`).

Design: a fixed-capacity device-resident ring buffer per lego type with
random-overwrite insertion (semantics of `utils/contact_buffer.py:5-42`),
maskable batched insert (no host sync in the hot loop — `insert` takes the
whole env batch plus a validity mask), uniform sampling, and `.npz`
save/load for cross-job handoff. At pod scale the buffer lives replicated;
inserts become an all-gather of per-chip candidates (see
`distributed/mesh.py`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Reservoir:
    """Fixed-size sample store. data: pytree of (types, capacity, ...) arrays.

    `capacity`/`num_types` are static (pytree aux data), so a Reservoir can
    cross jit boundaries without its shape parameters becoming tracers.
    """

    data: object
    count: jnp.ndarray  # (types,) number of valid entries (<= capacity)
    capacity: int = dataclasses.field(metadata=dict(static=True))
    num_types: int = dataclasses.field(metadata=dict(static=True))


def create(template, capacity: int, num_types: int = 1) -> Reservoir:
    """template: pytree of per-sample arrays (shape suffix)."""
    data = jax.tree_util.tree_map(
        lambda x: jnp.zeros((num_types, capacity) + jnp.asarray(x).shape,
                            dtype=jnp.asarray(x).dtype),
        template,
    )
    return Reservoir(data, jnp.zeros(num_types, dtype=jnp.int32), capacity, num_types)


def insert(res: Reservoir, samples, type_idx: jnp.ndarray, valid: jnp.ndarray) -> Reservoir:
    """Batched masked insert.

    samples: pytree of (N, ...) arrays; type_idx: (N,) int; valid: (N,) bool.
    While the reservoir is not full, entries append; once full, they overwrite
    uniformly random slots (random-overwrite reservoir, like
    `utils/contact_buffer.py:24-38`). Invalid rows write to a scratch slot
    index == capacity (dropped), keeping everything fixed-shape.
    """
    N = valid.shape[0]
    # derive per-sample slot: position within its type's stream
    # rank of each sample among same-type valid samples in this batch
    type_onehot = jax.nn.one_hot(type_idx, res.num_types, dtype=jnp.int32)  # (N, T)
    type_onehot = type_onehot * valid[:, None].astype(jnp.int32)
    prefix = jnp.cumsum(type_onehot, axis=0) - type_onehot  # exclusive prefix count
    offset = jnp.sum(prefix * type_onehot, axis=1)  # (N,)
    base = jnp.sum(res.count[None, :] * type_onehot, axis=1)  # (N,)
    stream_pos = base + offset

    # slot: append while stream_pos < capacity, else pseudo-random overwrite
    key = jax.random.fold_in(jax.random.PRNGKey(17), jnp.sum(res.count))
    rand_slots = jax.random.randint(key, (N,), 0, res.capacity)
    slot = jnp.where(stream_pos < res.capacity, stream_pos % res.capacity, rand_slots)
    slot = jnp.where(valid, slot, res.capacity)  # scratch slot for invalid

    def upd(buf, xs):
        # buf: (T, cap, ...), xs: (N, ...); pad a scratch row per type
        padded = jnp.concatenate(
            [buf, jnp.zeros((res.num_types, 1) + buf.shape[2:], dtype=buf.dtype)], axis=1
        )
        padded = padded.at[type_idx, slot].set(xs)
        return padded[:, : res.capacity]

    data = jax.tree_util.tree_map(upd, res.data, samples)
    added = jnp.sum(type_onehot, axis=0)  # (T,)
    count = jnp.minimum(res.count + added, res.capacity)
    return Reservoir(data, count, res.capacity, res.num_types)


def sample(res: Reservoir, key, type_idx: jnp.ndarray):
    """Uniform sample of one entry of the given type. type_idx: scalar int."""
    n = jnp.maximum(res.count[type_idx], 1)
    idx = jax.random.randint(key, (), 0, n)
    return jax.tree_util.tree_map(lambda buf: buf[type_idx, idx], res.data)


def sample_batch(res: Reservoir, key, type_idx: jnp.ndarray):
    """type_idx: (N,) -> pytree of (N, ...) samples."""
    n = jnp.maximum(res.count[type_idx], 1)
    idx = jax.random.randint(key, type_idx.shape, 0, jnp.int32(2**31 - 1)) % n
    return jax.tree_util.tree_map(lambda buf: buf[type_idx, idx], res.data)


def save(path: str, res: Reservoir):
    flat, _ = jax.tree_util.tree_flatten(res.data)
    np.savez(
        path,
        count=np.asarray(res.count),
        capacity=res.capacity,
        num_types=res.num_types,
        *[np.asarray(x) for x in flat],
    )


def load(path: str, template) -> Reservoir:
    data = np.load(path)
    arrays = [jnp.asarray(data[k]) for k in data.files if k.startswith("arr_")]
    _, treedef = jax.tree_util.tree_flatten(template)
    tree = jax.tree_util.tree_unflatten(treedef, arrays)
    return Reservoir(
        tree,
        jnp.asarray(data["count"]),
        int(data["capacity"]),
        int(data["num_types"]),
    )
