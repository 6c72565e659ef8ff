"""Fill — lazy time-invariant per-step parameters.

The reference uses FillArrays.Fill to represent time-invariant transition
matrices without O(N) storage (reference: src/gp/lti_sde.jl:148-160). The JAX
equivalent here: a `Fill` pytree leaf wraps one value plus a static length.
Scan engines close over Fill values (they never enter the scanned arrays, so a
time-invariant A costs O(1) HBM traffic per scan, not O(N)), and the parallel
engines broadcast them lazily so XLA can fuse the broadcast into consumers.
"""

from typing import Any

import jax
import jax.numpy as jnp

from .pytrees import pytree_dataclass


@pytree_dataclass(static_fields=("N",))
class Fill:
    value: Any
    N: int

    def __len__(self):
        return self.N


def is_fill(x) -> bool:
    return isinstance(x, Fill)


def _flatten(tree):
    return jax.tree_util.tree_flatten(tree, is_leaf=is_fill)


def time_length(tree) -> int:
    """Length of the time axis of a per-step parameter tree."""
    leaves, _ = _flatten(tree)
    for leaf in leaves:
        if is_fill(leaf):
            return leaf.N
        return leaf.shape[0]
    raise ValueError("empty parameter tree")


def tindex(tree, t):
    """Per-step slice of a parameter tree (Fill leaves yield their value)."""
    leaves, treedef = _flatten(tree)
    out = [l.value if is_fill(l) else l[t] for l in leaves]
    return jax.tree_util.tree_unflatten(treedef, out)


def tmaterialize(tree):
    """Broadcast every Fill leaf to a concrete leading time axis."""
    leaves, treedef = _flatten(tree)
    out = [
        jnp.broadcast_to(l.value, (l.N,) + jnp.shape(l.value)) if is_fill(l) else l
        for l in leaves
    ]
    return jax.tree_util.tree_unflatten(treedef, out)


def tmap(fn, tree):
    """Map fn over per-step values, preserving Fill laziness."""
    leaves, treedef = _flatten(tree)
    out = [Fill(fn(l.value), l.N) if is_fill(l) else jax.vmap(fn)(l) for l in leaves]
    return jax.tree_util.tree_unflatten(treedef, out)


def treshape_blocks(tree, n_blocks: int):
    """Reshape the time axis N -> (n_blocks, N // n_blocks) for the
    block-parallel engine. Fill leaves become nested Fills (still lazy)."""
    leaves, treedef = _flatten(tree)

    def go(l):
        if is_fill(l):
            return Fill(Fill(l.value, l.N // n_blocks), n_blocks)
        return l.reshape((n_blocks, l.shape[0] // n_blocks) + l.shape[1:])

    return jax.tree_util.tree_unflatten(treedef, [go(l) for l in leaves])


def scan_emit(step, params, init, *, reverse: bool = False, length: int = None):
    """Sequential scan over the time axis of `params`.

    TPU-native replacement for the reference's `scan_emit` loop
    (reference: src/util/scan.jl:15-28): `step(carry, slice) -> (emit, carry)`.
    Fill leaves are closed over (O(1) memory traffic); array leaves are
    scanned. Emitted outputs are stacked along a leading time axis aligned
    with the *original* time index (for reverse scans, emits[t] still
    corresponds to time t, matching the reference's `ys[t] = y`).

    Returns (emits, final_carry).
    """
    leaves, treedef = _flatten(params)
    fill_mask = [is_fill(l) for l in leaves]
    scanned = tuple(l for l, m in zip(leaves, fill_mask) if not m)
    fills = [l.value for l, m in zip(leaves, fill_mask) if m]
    if length is None:
        length = time_length(params)

    def body(carry, xs):
        it_s, it_f = iter(xs), iter(fills)
        slice_leaves = [next(it_f) if m else next(it_s) for m in fill_mask]
        sl = jax.tree_util.tree_unflatten(treedef, slice_leaves)
        emit, new_carry = step(carry, sl)
        return new_carry, emit

    carry, emits = jax.lax.scan(body, init, scanned, length=length, reverse=reverse)
    return emits, carry
