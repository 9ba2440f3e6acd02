"""Minimal ``xarray`` stand-in for tests (``open_zarr`` only).

This host image ships no xarray/zarr, but
``cli/convert_wb2_climatology``'s main (and therefore the zarr branch of
``scripts/acceptance_2018.sh``) needs ``xarray.open_zarr``. The
acceptance-script smoke test prepends this directory to ``PYTHONPATH``
so the CONVERTER CLI and the bash glue execute for real against a
synthetic store.

Store layout (written by the test, NOT a real zarr): a directory
containing ``meta.json`` mapping variable name -> list of dim names,
plus one ``<name>.npy`` per variable/coordinate. The returned dataset
duck-types the exact surface ``wb2_climatology_to_arrays`` consumes
(``ds[name].dims`` / ``ds[name].values``).
"""

import json
import os

import numpy as np


class _Array:
    def __init__(self, dims, values):
        self.dims = tuple(dims)
        self.values = values


class _Dataset:
    def __init__(self, store):
        with open(os.path.join(store, "meta.json")) as f:
            self._dims = json.load(f)
        self._store = store

    def __getitem__(self, name):
        return _Array(self._dims[name],
                      np.load(os.path.join(self._store, name + ".npy")))


def open_zarr(path):
    return _Dataset(path)
