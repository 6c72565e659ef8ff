"""Multi-chip distributed Kalman filtering via shard_map over a device Mesh.

The reference is single-process with a sequential loop (reference:
src/util/scan.jl:15-28) — no distributed execution exists there. This module
is the TPU-native scaling design: the time axis is sharded across devices
(sequence parallelism over ICI), each device reduces its chunk to ONE
filtering element (ops/block.chunk_total_element), the tiny per-device
elements are exchanged with a single all_gather, an exclusive prefix gives
every device its exact boundary filtering state, and each device finishes its
chunk locally. Communication volume is O(n_dev * D^2) per logpdf — independent
of N.

An optional leading batch axis of independent series shards over a second
mesh axis (data parallelism): mesh ("dp", "t") covers dp x sp for this model
family (there is no tensor/pipeline dimension in an O(D^2) state recursion —
D is 2-16; the FLOPs live along time and batch).
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
# NB: the stable jax.shard_map (v0.8+) enforces varying-axes (VMA) typing on
# scan carries, which would require pvary plumbing through every engine; the
# experimental entry point with check_rep=False matches our replication
# pattern (constants combined with axis-varying data inside local scans).
import warnings

with warnings.catch_warnings():
    warnings.simplefilter("ignore", DeprecationWarning)
    from jax.experimental.shard_map import shard_map

from ..models import emissions as em
from ..ops import block
from ..ops.assoc import _combine_filter as _combine
from ..utils import psd
from ..utils.fill import Fill, is_fill
from ..utils.gaussian import Gaussian


def _flatten_params(model):
    params = ((model.trans.As, model.trans.offs, model.trans.Qs), model.emis)
    leaves, treedef = jax.tree_util.tree_flatten(params, is_leaf=is_fill)
    fill_mask = [is_fill(l) for l in leaves]
    arrs = [l for l, m in zip(leaves, fill_mask) if not m]
    fills = [l.value for l, m in zip(leaves, fill_mask) if m]
    return treedef, fill_mask, arrs, fills


def _rebuild(treedef, fill_mask, arrs, fills, n_local):
    it_a, it_f = iter(arrs), iter(fills)
    leaves = [
        Fill(next(it_f), n_local) if m else next(it_a) for m in fill_mask
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def sharded_logpdf(
    model,
    y,
    mesh: Mesh,
    *,
    time_axis: str = "t",
    batch_axis: Optional[str] = None,
    n_blocks: Optional[int] = None,
):
    """Distributed logpdf of a forward scalar-emission LGSSM.

    y: (N,) for a single series, or (Bt, N) with `batch_axis` set for a
    data-parallel batch of independent series sharing the model.
    Returns the scalar total logpdf (summed over the batch if batched).
    """
    if not model.trans.forward or not isinstance(model.emis, em.ScalarEmissions):
        raise NotImplementedError(
            "sharded_logpdf supports forward scalar-emission models"
        )
    D = model.latent_dim
    x0 = model.trans.x0
    dtype = x0.dtype
    treedef, fill_mask, arrs, fills = _flatten_params(model)

    batched = y.ndim == 2
    if batched and batch_axis is None:
        raise ValueError("batched y requires batch_axis")

    y_spec = P(batch_axis, time_axis) if batched else P(time_axis)
    arr_specs = tuple(P(time_axis) for _ in arrs)
    fill_specs = tuple(P() for _ in fills)
    x0_spec = (P(), P())

    def local_fn(y_loc, arrs_loc, fills_loc, x0_loc):
        n_local = y_loc.shape[-1]
        params = _rebuild(treedef, fill_mask, list(arrs_loc), list(fills_loc), n_local)
        x0_g = Gaussian(*x0_loc)

        def one_series(y1):
            return block.chunk_total_element((params, y1), D, dtype, n_blocks=n_blocks)

        prior = (
            jnp.zeros((D, D), dtype),
            x0_g.mean.astype(dtype),
            psd.symmetrize(x0_g.cov).astype(dtype),
            jnp.zeros((D,), dtype),
            jnp.zeros((D, D), dtype),
        )

        def prefix_and_lml(y1):
            agg = one_series(y1)
            all_agg = jax.lax.all_gather(agg, time_axis)  # (n_dev, ...)

            # Exclusive prefix over the tiny device-level elements: the carry
            # BEFORE combining device d's aggregate is d's boundary element.
            def fold(c, e):
                return _combine(c, e), c

            _, excl = jax.lax.scan(fold, prior, all_agg)
            idx = jax.lax.axis_index(time_axis)
            start_elem = jax.tree_util.tree_map(lambda a: a[idx], excl)
            start = Gaussian(start_elem[1], start_elem[2])
            return block.chunk_logpdf_from_start(
                (params, y1), start, D, dtype, n_blocks=n_blocks
            )

        if batched:
            lml_loc = jnp.sum(jax.vmap(prefix_and_lml)(y_loc))
        else:
            lml_loc = prefix_and_lml(y_loc)
        total = jax.lax.psum(lml_loc, time_axis)
        if batched:
            total = jax.lax.psum(total, batch_axis)
        return total

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(y_spec, arr_specs, fill_specs, x0_spec),
        out_specs=P(),
        check_rep=False,
    )
    return fn(jnp.asarray(y), tuple(arrs), tuple(fills), (x0.mean, x0.cov))
