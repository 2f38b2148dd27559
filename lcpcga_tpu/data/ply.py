"""PLY point-cloud I/O (numpy, no Open3D dependency).

Replaces the reference's Open3D PLY usage
(/root/reference/data/utils/RawLoader.py:47, /root/reference/utils.py:346-376;
SURVEY.md §2.2). Supports ascii and binary_little_endian, vertex
positions (float/double/int), uchar RGB, optional float normals —
the formats that occur across 8iVFB/MVUB/UVG-VPC and the MPEG codec
outputs (including the double-precision quirk the reference fixes up
with ``save_ply``'s rewrite, /root/reference/utils.py:346-376).
"""

from __future__ import annotations

import numpy as np

_DTYPES = {
    "float": "<f4", "float32": "<f4",
    "double": "<f8", "float64": "<f8",
    "uchar": "u1", "uint8": "u1",
    "char": "i1", "int8": "i1",
    "ushort": "<u2", "uint16": "<u2",
    "short": "<i2", "int16": "<i2",
    "uint": "<u4", "uint32": "<u4",
    "int": "<i4", "int32": "<i4",
}


def read_ply(path: str):
    """Returns dict with 'points' [N,3] float64, optional 'colors' [N,3]
    float32 in [0,1], optional 'normals' [N,3] float32."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            header.append(line)
            if line == "end_header":
                break
        fmt = None
        n_vertex = 0
        props = []
        in_vertex = False
        for line in header:
            t = line.split()
            if not t:
                continue
            if t[0] == "format":
                fmt = t[1]
            elif t[0] == "element":
                in_vertex = t[1] == "vertex"
                if in_vertex:
                    n_vertex = int(t[2])
            elif t[0] == "property" and in_vertex:
                if t[1] == "list":
                    raise ValueError("list properties unsupported in vertex element")
                props.append((t[2], _DTYPES[t[1]]))

        dtype = np.dtype(props)
        if fmt == "ascii":
            data = np.loadtxt(f, dtype=dtype, max_rows=n_vertex, ndmin=1)
        elif fmt == "binary_little_endian":
            data = np.frombuffer(f.read(dtype.itemsize * n_vertex), dtype=dtype)
        elif fmt == "binary_big_endian":
            be = np.dtype([(n, d.replace("<", ">")) for n, d in props])
            data = np.frombuffer(f.read(be.itemsize * n_vertex), dtype=be)
        else:
            raise ValueError(f"unknown ply format {fmt}")

    names = data.dtype.names
    out = {
        "points": np.stack(
            [data["x"].astype(np.float64), data["y"].astype(np.float64),
             data["z"].astype(np.float64)], axis=1
        )
    }
    if all(c in names for c in ("red", "green", "blue")):
        cols = np.stack([data["red"], data["green"], data["blue"]], axis=1)
        if cols.dtype == np.uint8:
            cols = cols.astype(np.float32) / 255.0
        out["colors"] = cols.astype(np.float32)
    if all(c in names for c in ("nx", "ny", "nz")):
        out["normals"] = np.stack(
            [data["nx"], data["ny"], data["nz"]], axis=1
        ).astype(np.float32)
    return out


def write_ply(path: str, points: np.ndarray, colors=None, normals=None,
              ascii: bool = False, coord_dtype: str = "float"):
    """colors: float [0,1] or uint8. coord_dtype: 'float'|'double'|'int'
    — anchors (tmc3) want float ascii (/root/reference/model/model.py:327-330)."""
    n = points.shape[0]
    props = [("x", coord_dtype), ("y", coord_dtype), ("z", coord_dtype)]
    arrays = [points[:, 0], points[:, 1], points[:, 2]]
    if normals is not None:
        props += [("nx", "float"), ("ny", "float"), ("nz", "float")]
        arrays += [normals[:, 0], normals[:, 1], normals[:, 2]]
    if colors is not None:
        c = colors
        if c.dtype != np.uint8:
            c = np.clip(np.round(np.asarray(c, np.float64) * 255.0), 0, 255).astype(np.uint8)
        props += [("red", "uchar"), ("green", "uchar"), ("blue", "uchar")]
        arrays += [c[:, 0], c[:, 1], c[:, 2]]

    dtype = np.dtype([(name, _DTYPES[t]) for name, t in props])
    rec = np.empty(n, dtype=dtype)
    for (name, _), arr in zip(props, arrays):
        rec[name] = arr

    fmt = "ascii" if ascii else "binary_little_endian"
    header = ["ply", f"format {fmt} 1.0", f"element vertex {n}"]
    header += [f"property {t} {name}" for name, t in props]
    header += ["end_header"]
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        if ascii:
            cols = []
            for (name, t) in props:
                a = rec[name]
                if t in ("float", "double"):
                    cols.append(np.char.mod("%.6g", a))
                else:
                    cols.append(np.char.mod("%d", a))
            lines = cols[0]
            for cc in cols[1:]:
                lines = np.char.add(np.char.add(lines, " "), cc)
            f.write(("\n".join(lines.tolist()) + "\n").encode("ascii"))
        else:
            f.write(rec.tobytes())
