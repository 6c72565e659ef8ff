"""Spatio-temporal input types and the flat <-> time-form data protocol.

Mirrors the reference's input types and data-representation protocol
(reference: src/space_time/rectilinear_grid.jl, regular_in_time.jl,
src/gp/data_representations.jl). Linear indexing is space-fastest, exactly as
in the reference (rectilinear_grid.jl:33-35), so flat vectors reshape to
(Nt, Ns) time-major blocks.

RegularInTime (ragged: different spatial points per time slice) is stored
*padded* to the max slice length with a validity mask: ragged data is the
XLA-hostile case, and the reference's own missing-data strategy (large
observation variance at masked entries, reference: src/models/missings.jl:1-6)
is precisely the static-shape-friendly mechanism that makes padding exact.
"""

from typing import Any

import numpy as np

import jax.numpy as jnp

from ..utils.pytrees import pytree_dataclass
from ..utils.regular_spacing import RegularSpacing, num_times, time_array


@pytree_dataclass
class RectilinearGrid:
    """Space x time product grid: `xl` spatial points (Ns,) or (Ns, Dx);
    `xr` times (RegularSpacing or (Nt,))."""

    xl: Any
    xr: Any

    def __len__(self):
        return self.xl.shape[0] * num_times(self.xr)


SpaceTimeGrid = RectilinearGrid  # alias, as in the reference (:45-47)


@pytree_dataclass(static_fields=("counts",))
class RegularInTime:
    """Ragged spatio-temporal inputs: times (Nt,), padded spatial points
    (Nt, max_n) or (Nt, max_n, Dx), and static per-time counts."""

    ts: Any
    vs_padded: Any
    counts: tuple  # static per-time numbers of valid spatial points

    def __len__(self):
        return int(sum(self.counts))

    @property
    def max_n(self) -> int:
        return self.vs_padded.shape[1]


def regular_in_time(ts, vs_list) -> RegularInTime:
    """Build a RegularInTime from a list of per-time spatial point arrays."""
    counts = tuple(int(np.shape(v)[0]) for v in vs_list)
    max_n = max(counts)
    first = np.asarray(vs_list[0])
    trailing = first.shape[1:]
    padded = np.zeros((len(vs_list), max_n) + trailing, dtype=np.asarray(first).dtype)
    for i, v in enumerate(vs_list):
        v = np.asarray(v)
        padded[i, : v.shape[0]] = v
        if v.shape[0] < max_n:
            # pad with the first valid point: keeps kernel matrices finite;
            # masked entries never influence results (large-variance fill).
            padded[i, v.shape[0] :] = v[0] if v.shape[0] else 0.0
    return RegularInTime(jnp.asarray(ts), jnp.asarray(padded), counts)


def valid_mask(x: RegularInTime):
    """(Nt, max_n) boolean mask of genuine (non-pad) entries."""
    idx = jnp.arange(x.max_n)[None, :]
    counts = jnp.asarray(x.counts)[:, None]
    return idx < counts


# ---------------------------------------------------------------------------
# Data-representation protocol (reference: src/gp/data_representations.jl)
# ---------------------------------------------------------------------------

def get_times(x):
    if isinstance(x, RectilinearGrid):
        return x.xr
    if isinstance(x, RegularInTime):
        return x.ts
    return x


def n_time(x) -> int:
    return num_times(get_times(x))


def n_space(x) -> int:
    if isinstance(x, RectilinearGrid):
        return x.xl.shape[0]
    if isinstance(x, RegularInTime):
        return x.max_n
    return 1


def observations_to_time_form(x, y):
    """Flat y -> per-time blocks (reference: rectilinear_grid.jl:78-84,
    regular_in_time.jl:53-55). Ragged inputs pad with NaN (missing)."""
    y = jnp.asarray(y)
    if isinstance(x, RectilinearGrid):
        return y.reshape(n_time(x), n_space(x))
    if isinstance(x, RegularInTime):
        # ONE static-index scatter: counts are static, so the flat->padded
        # index map is a host-side numpy computation and the whole fill is
        # a single .at[].set — the previous per-row loop emitted Nt
        # dynamic-update-slices and made ragged compiles crawl ("Very slow
        # compile" at Nt=4096). y may be traced (jitted elbo losses), so
        # only y.dtype is read, never its values.
        rr, cc = _ragged_scatter_indices(x)
        out = jnp.full((n_time(x), x.max_n), jnp.nan, dtype=y.dtype)
        return out.at[rr, cc].set(y)
    return y


def _ragged_scatter_indices(x):
    """Host-side (row, col) indices of each flat observation in the padded
    (Nt, max_n) layout, from the static counts."""
    counts = np.asarray(x.counts)
    rr = np.repeat(np.arange(counts.shape[0]), counts)
    cc = np.concatenate([np.arange(c) for c in counts]) if counts.size else (
        np.zeros((0,), np.int64)
    )
    return rr, cc


def noise_var_to_time_form(x, noise_flat):
    """Flat per-observation variances -> per-time diagonal blocks
    (reference: rectilinear_grid.jl:92-95, regular_in_time.jl:58-61).
    Padded entries get unit variance (they are always missing)."""
    noise_flat = jnp.asarray(noise_flat)
    if isinstance(x, RectilinearGrid):
        return noise_flat.reshape(n_time(x), n_space(x))
    if isinstance(x, RegularInTime):
        rr, cc = _ragged_scatter_indices(x)
        out = jnp.ones((n_time(x), x.max_n), noise_flat.dtype)
        return out.at[rr, cc].set(noise_flat)
    return noise_flat


def destructure(x, ys):
    """Per-time blocks -> flat vector (reference: rectilinear_grid.jl:97,
    regular_in_time.jl:63)."""
    ys = jnp.asarray(ys)
    if isinstance(x, RectilinearGrid):
        return ys.reshape(-1)
    if isinstance(x, RegularInTime):
        rr, cc = _ragged_scatter_indices(x)  # one gather, not Nt slices
        return ys[rr, cc]
    return ys


def flat_len(x) -> int:
    if isinstance(x, RectilinearGrid):
        return n_time(x) * n_space(x)
    if isinstance(x, RegularInTime):
        return int(sum(x.counts))
    return num_times(x)
