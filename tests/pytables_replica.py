"""Minimal PyTables WRITER replica over h5py, faithful to the PyTables
file-format conventions (pytables is not installed in this environment).

The reference writes coefficient files through pytables
(/root/reference/volumetricinterp/interpolate.py:676-708:
``tables.open_file`` + ``create_group``/``create_array``), which decorates
every node with system attributes beyond the raw HDF5 datasets:

* root group:   CLASS='GROUP', PYTABLES_FORMAT_VERSION='2.1', TITLE,
                VERSION='1.0'
* groups:       CLASS='GROUP', TITLE, VERSION='1.0'
* arrays:       CLASS='ARRAY', TITLE, VERSION='2.4', FLAVOR ('numpy' for
                ndarray input, 'python' for python scalars/lists — the
                conversions create_array applies before storing)

This module reproduces those conventions (attribute values stored as
fixed-length byte strings, as pytables does), so interop tests exercise a
genuinely pytables-shaped file on the WRITE side instead of bare h5py
datasets — closing the gap that a pure h5py shim leaves (the reference
reader must also accept OUR files, which carry no pytables attributes;
pytables reads foreign HDF5 files fine, it only decorates what it writes).
"""

from __future__ import annotations

import numpy as np


def _set_sys_attrs(node, **attrs):
    for k, v in attrs.items():
        node.attrs[k] = np.bytes_(v.encode("utf-8"))


class Node:
    def __init__(self, dset):
        self._d = dset

    def __getitem__(self, idx):
        return self._d[idx]

    def read(self):
        val = self._d[()]
        flavor = self._d.attrs.get("FLAVOR", b"numpy")
        if isinstance(flavor, bytes):
            flavor = flavor.decode()
        if flavor == "python":
            # pytables converts python-flavored nodes back to python objects
            if np.ndim(val) == 0 and isinstance(val, bytes):
                return val
            if np.ndim(val) == 1 and val.dtype.kind == "S":
                return [x for x in val]
        return val


class File:
    """The subset of tables.File the reference touches: get_node,
    create_group, create_array — writing pytables-convention metadata."""

    def __init__(self, filename, mode="r", title=""):
        import h5py

        self._f = h5py.File(filename, mode)
        if mode in ("w", "a") and "CLASS" not in self._f["/"].attrs:
            _set_sys_attrs(self._f["/"], CLASS="GROUP",
                           PYTABLES_FORMAT_VERSION="2.1", TITLE=title,
                           VERSION="1.0")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def close(self):
        self._f.close()

    def get_node(self, path):
        return Node(self._f[path])

    def create_group(self, where, name, title=""):
        base = where if isinstance(where, str) else str(where)
        path = base.rstrip("/") + "/" + name
        g = self._f.create_group(path)
        _set_sys_attrs(g, CLASS="GROUP", TITLE=title, VERSION="1.0")
        return path

    def create_array(self, where, name, obj=None, title=""):
        base = where if isinstance(where, str) else str(where)
        path = base.rstrip("/") + "/" + name
        flavor = "numpy"
        if isinstance(obj, np.ndarray):
            data = obj
        elif isinstance(obj, list):
            flavor = "python"
            if obj and isinstance(obj[0], str):
                data = np.array([s.encode("utf-8") for s in obj])
            else:
                data = np.asarray(obj)
        elif isinstance(obj, str):
            flavor = "python"
            data = np.bytes_(obj.encode("utf-8"))
        elif isinstance(obj, bytes):
            flavor = "python"
            data = np.bytes_(obj)
        elif isinstance(obj, (int, float, np.generic)):
            flavor = "python"
            data = np.asarray(obj)
        else:
            data = np.asarray(obj)
        d = self._f.create_dataset(path, data=data)
        _set_sys_attrs(d, CLASS="ARRAY", TITLE=title, VERSION="2.4",
                       FLAVOR=flavor)
        return path


def open_file(filename, mode="r", title=""):
    return File(filename, mode, title=title)
