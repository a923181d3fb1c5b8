"""Dependency-free PLY mesh reader.

The reference preprocessors lean on ``plyfile``/``open3d`` to read ScanNet
and ARKitScenes meshes (pointcept/datasets/preprocessing/scannet/
preprocess_scannet.py:18, arkitscenes/preprocess_arkitscenes_mesh.py:8).
Neither library is in this image, so this module parses the two layouts
those datasets actually ship — ``format ascii 1.0`` and
``format binary_little_endian 1.0`` with optional uchar-counted list
properties (face vertex_indices) — straight into numpy.
"""

from __future__ import annotations

import numpy as np

_SCALAR = {
    "char": "i1", "int8": "i1",
    "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2",
    "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4",
    "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4",
    "double": "f8", "float64": "f8",
}


def _parse_header(f):
    """Consume the header; return (fmt, [(elem_name, count, props)]).

    ``props`` is a list of ("scalar", name, dtype) or
    ("list", name, count_dtype, item_dtype) in declaration order.
    """
    if f.readline().strip() != b"ply":
        raise ValueError("not a PLY file")
    fmt = None
    elements = []
    while True:
        line = f.readline()
        if not line:
            raise ValueError("unterminated PLY header")
        tokens = line.decode("ascii").strip().split()
        if not tokens or tokens[0] == "comment":
            continue
        if tokens[0] == "format":
            fmt = tokens[1]
        elif tokens[0] == "element":
            elements.append((tokens[1], int(tokens[2]), []))
        elif tokens[0] == "property":
            props = elements[-1][2]
            if tokens[1] == "list":
                props.append(("list", tokens[4], _SCALAR[tokens[2]],
                              _SCALAR[tokens[3]]))
            else:
                props.append(("scalar", tokens[2], _SCALAR[tokens[1]]))
        elif tokens[0] == "end_header":
            break
    if fmt not in ("ascii", "binary_little_endian"):
        raise ValueError(f"unsupported PLY format: {fmt}")
    return fmt, elements


def _read_binary_element(f, count, props):
    if all(kind == "scalar" for kind, *_ in props):
        dtype = np.dtype([(name, "<" + dt) for _, name, dt in props])
        data = np.frombuffer(f.read(dtype.itemsize * count), dtype=dtype)
        return {name: data[name] for _, name, _ in props}
    # lists force row-by-row decoding (ragged in general; ScanNet faces
    # are uniform triangles so the common case still vectorizes per row)
    out = {name: [] for _, name, *_ in props}
    for _ in range(count):
        for prop in props:
            if prop[0] == "scalar":
                _, name, dt = prop
                out[name].append(
                    np.frombuffer(f.read(np.dtype(dt).itemsize), "<" + dt)[0]
                )
            else:
                _, name, cnt_dt, item_dt = prop
                k = int(np.frombuffer(
                    f.read(np.dtype(cnt_dt).itemsize), "<" + cnt_dt)[0])
                item = np.dtype(item_dt)
                out[name].append(
                    np.frombuffer(f.read(item.itemsize * k), "<" + item_dt)
                )
    return {k: (np.stack(v) if v and isinstance(v[0], np.ndarray)
                and all(len(x) == len(v[0]) for x in v) else np.asarray(v))
            for k, v in out.items()}


def _read_ascii_element(f, count, props):
    out = {name: [] for _, name, *_ in props}
    for _ in range(count):
        fields = f.readline().decode("ascii").split()
        i = 0
        for prop in props:
            if prop[0] == "scalar":
                _, name, dt = prop
                out[name].append(np.dtype(dt).type(fields[i]))
                i += 1
            else:
                _, name, _, item_dt = prop
                k = int(fields[i])
                out[name].append(
                    np.asarray(fields[i + 1: i + 1 + k], dtype=item_dt))
                i += 1 + k
    return {k: (np.stack(v) if v and isinstance(v[0], np.ndarray)
                and all(len(x) == len(v[0]) for x in v) else np.asarray(v))
            for k, v in out.items()}


def read_ply(path):
    """Read a PLY file -> {element: {property: np.ndarray}}.

    Uniform list properties (triangle faces) come back stacked as (F, K)
    int arrays; ragged lists as 1-D object arrays.
    """
    with open(path, "rb") as f:
        fmt, elements = _parse_header(f)
        result = {}
        for name, count, props in elements:
            reader = (_read_binary_element if fmt == "binary_little_endian"
                      else _read_ascii_element)
            result[name] = reader(f, count, props)
    return result


def read_mesh(path):
    """Read vertices (+faces) -> (coord f32 (N,3), color u8 (N,3) | None,
    extra vertex props dict, faces int (F,3) | None)."""
    ply = read_ply(path)
    v = ply["vertex"]
    coord = np.stack([v["x"], v["y"], v["z"]], axis=1).astype(np.float32)
    color = None
    if "red" in v:
        color = np.stack([v["red"], v["green"], v["blue"]], axis=1)
    extra = {k: arr for k, arr in v.items()
             if k not in ("x", "y", "z", "red", "green", "blue", "alpha")}
    faces = None
    if "face" in ply and "vertex_indices" in ply["face"]:
        faces = np.asarray(ply["face"]["vertex_indices"])
        if faces.dtype == object:
            faces = np.stack([np.asarray(fc) for fc in faces])
        faces = faces.astype(np.int64)
    return coord, color, extra, faces
