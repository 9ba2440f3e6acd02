"""Minimal labeled-array stand-in for the xarray surface the reference
tracker uses (evaluate/track.py select_box / find_local_minimum /
track_first_n_steps).

xarray is not in this image; the reference tracker only touches a small,
well-defined slice of its API on in-memory data (`.dims`, coordinate
comparisons, dim-aligned ``&``/``|`` broadcasting, ``.where(mask,
drop=True)``, ``.sel`` with exact and ``method="nearest"`` lookups,
``.min()``, ``.values``, ``.size``, ``.compute()``/``.load()``). This
module implements exactly that slice so the ACTUAL reference functions
run unmodified as parity oracles (tests/test_oracle_tracker.py).
"""

from __future__ import annotations

import numpy as np


class LabeledArray:
    """A labeled nd-array: values + dim names + per-dim coordinate vectors."""

    def __init__(self, values, dims, coords):
        self.values = np.asarray(values)
        self.dims = tuple(dims)
        self.coords = {d: np.asarray(coords[d]) for d in self.dims
                       if d in coords}
        assert self.values.ndim == len(self.dims)

    # --- coordinate access (da.latitude, da.longitude, ...) ---
    def __getattr__(self, name):
        coords = object.__getattribute__(self, "coords")
        if name in coords:
            return LabeledArray(coords[name], (name,), {name: coords[name]})
        raise AttributeError(name)

    # --- basic array surface ---
    @property
    def size(self):
        return self.values.size

    def __float__(self):
        return float(self.values)

    def min(self):
        return LabeledArray(np.nanmin(self.values), (), {})

    def compute(self):
        return self

    def load(self):
        return self

    # --- comparisons -> boolean LabeledArrays ---
    def _cmp(self, other, op):
        o = other.values if isinstance(other, LabeledArray) else other
        return LabeledArray(op(self.values, o), self.dims, self.coords)

    def __ge__(self, other):
        return self._cmp(other, lambda a, b: a >= b)

    def __le__(self, other):
        return self._cmp(other, lambda a, b: a <= b)

    def __gt__(self, other):
        return self._cmp(other, lambda a, b: a > b)

    def __lt__(self, other):
        return self._cmp(other, lambda a, b: a < b)

    # --- dim-aligned broadcasting for & and | (the xarray behavior the
    # tracker's select_box relies on: a (latitude,) mask & a (longitude,)
    # mask -> a (latitude, longitude) mask) ---
    def _broadcast_with(self, other):
        dims = list(self.dims) + [d for d in other.dims
                                  if d not in self.dims]
        coords = {**other.coords, **self.coords}

        def expand(a):
            shape = [a.values.shape[a.dims.index(d)] if d in a.dims else 1
                     for d in dims]
            order = [a.dims.index(d) for d in dims if d in a.dims]
            return np.transpose(a.values, order).reshape(shape)

        return dims, coords, expand(self), expand(other)

    def __and__(self, other):
        dims, coords, a, b = self._broadcast_with(other)
        return LabeledArray(a & b, dims, coords)

    def __or__(self, other):
        dims, coords, a, b = self._broadcast_with(other)
        return LabeledArray(a | b, dims, coords)

    # --- selection ---
    def sel(self, indexers=None, method=None, **kw):
        if indexers:
            kw = {**indexers, **kw}
        out = self
        for dim, val in kw.items():
            if dim not in out.dims:
                raise KeyError(dim)
            ax = out.dims.index(dim)
            coord = out.coords[dim]
            if method == "nearest":
                diffs = np.abs(np.asarray(coord, np.float64) - float(val))
                i = int(np.argmin(diffs))
            else:
                matches = [j for j, c in enumerate(coord.tolist())
                           if c == val]
                if not matches:
                    raise KeyError(f"{val!r} not in {dim}")
                i = matches[0]
            values = np.take(out.values, i, axis=ax)
            dims = tuple(d for d in out.dims if d != dim)
            coords = {d: c for d, c in out.coords.items() if d != dim}
            out = LabeledArray(values, dims, coords)
        return out

    # --- where(mask, drop=True): drop coordinates all-False along each
    # dim, NaN-fill remaining False cells (xarray semantics) ---
    def where(self, mask, drop=False):
        dims = list(self.dims) + [d for d in mask.dims
                                  if d not in self.dims]
        assert dims == list(self.dims), "mask introduces new dims"
        shape = [mask.values.shape[mask.dims.index(d)] if d in mask.dims
                 else 1 for d in self.dims]
        order = [mask.dims.index(d) for d in self.dims if d in mask.dims]
        m = np.broadcast_to(np.transpose(mask.values, order).reshape(shape),
                            self.values.shape)
        values = np.where(m, self.values, np.nan)
        coords = dict(self.coords)
        if drop:
            for ax, d in enumerate(self.dims):
                other_axes = tuple(i for i in range(values.ndim) if i != ax)
                keep = m.any(axis=other_axes)
                values = np.compress(keep, values, axis=ax)
                m = np.compress(keep, m, axis=ax)
                if d in coords:
                    coords[d] = coords[d][keep]
        return LabeledArray(values, self.dims, coords)


class FakeDataArray(LabeledArray):
    """Adds the slicing surface the reference ``XarrayDataset3D``
    (dataloader/ar_dataloder.py:74-162) touches on its (C, time, H, W)
    DataArray: positional ``__getitem__`` (ints drop the dim, slices keep
    it, coords follow), ``.isel(time=...)``, ``.shape``, ``.to_numpy()``."""

    @property
    def shape(self):
        return self.values.shape

    def to_numpy(self):
        return self.values

    def __getattr__(self, name):
        coords = object.__getattribute__(self, "coords")
        if name in coords:
            return FakeDataArray(coords[name], (name,), {name: coords[name]})
        raise AttributeError(name)

    def isel(self, indexers=None, **kw):
        if indexers:
            kw = {**indexers, **kw}
        out = self
        for dim, sl in kw.items():
            ax = out.dims.index(dim)
            key = (slice(None),) * ax + (sl,)
            out = out[key]
        return out

    def __getitem__(self, key):
        if not isinstance(key, tuple):
            key = (key,)
        values = self.values[key]
        dims, coords = [], {}
        for ax, d in enumerate(self.dims):
            k = key[ax] if ax < len(key) else slice(None)
            if isinstance(k, int):
                continue  # dim dropped
            dims.append(d)
            if d in self.coords:
                coords[d] = self.coords[d][k]
        if not dims:
            # xarray's Variable.values unwraps 0-d datetime64/timedelta64
            # to numpy scalars (xarray core.variable._as_array_or_item);
            # numpy int-indexing already yields the scalar here.
            class _Scalar:
                pass

            s = _Scalar()
            s.values = values
            return s
        return FakeDataArray(values, dims, coords)


class OracleDataArray:
    """The xr.DataArray slice ``latent_ens_to_xarr`` (pipelines/utils.py:
    83-246) constructs and mutates: a numpy buffer + dims, with in-place
    ``.values[...] = ...`` assignment."""

    def __init__(self, data, dims=None, coords=None):
        self.values = np.asarray(data)
        self.dims = tuple(dims) if dims is not None else tuple(
            f"dim_{i}" for i in range(self.values.ndim))
        self.coords = dict(coords or {})
        assert self.values.ndim == len(self.dims)


class OracleDataset:
    """The xr.Dataset surface ``latent_ens_to_xarr`` touches: construction
    from coords, variable assignment, ``expand_dims`` (new dim prepended to
    every variable, real-xarray default), per-variable dim-filtered
    ``transpose``, no-op ``chunk``."""

    def __init__(self, coords=None, data_vars=None):
        self.coords = {k: np.asarray(v) for k, v in (coords or {}).items()}
        self._v = dict(data_vars or {})

    def __setitem__(self, name, da):
        assert isinstance(da, OracleDataArray), type(da)
        self._v[name] = da

    def __getitem__(self, name):
        return self._v[name]

    def __contains__(self, name):
        return name in self._v

    @property
    def data_vars(self):
        return dict(self._v)

    def expand_dims(self, dim):
        assert isinstance(dim, dict), "oracle surface: expand_dims(dict)"
        for d, vals in dim.items():
            self.coords[d] = np.asarray(vals)
            for da in self._v.values():
                da.values = da.values[None]
                da.dims = (d,) + da.dims
        return self

    def transpose(self, *order):
        for da in self._v.values():
            sub = [d for d in order if d in da.dims]
            assert sorted(sub) == sorted(da.dims), (order, da.dims)
            da.values = np.transpose(da.values,
                                     [da.dims.index(d) for d in sub])
            da.dims = tuple(sub)
        return self

    def chunk(self, *args, **kwargs):
        return self


class FakeDataset:
    """dict of LabeledArrays with xarray-Dataset surface for the tracker."""

    def __init__(self, variables):
        self._v = dict(variables)

    @property
    def dims(self):
        out = []
        for v in self._v.values():
            for d in v.dims:
                if d not in out:
                    out.append(d)
        return tuple(out)

    def __getitem__(self, k):
        return self._v[k]

    def __contains__(self, k):
        return k in self._v

    def sel(self, indexers=None, **kw):
        if indexers:
            kw = {**indexers, **kw}
        out = {}
        for name, v in self._v.items():
            sub = {d: val for d, val in kw.items() if d in v.dims}
            out[name] = v.sel(**sub) if sub else v
        return FakeDataset(out)
