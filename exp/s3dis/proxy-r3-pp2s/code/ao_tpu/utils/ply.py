"""Standalone PLY reader/writer (reference: pointcept/utils/ply.py, 352 LoC).

Fresh implementation of the same capability: binary little-endian PLY with
arbitrary named float/int vertex properties, plus optional triangular
faces. Used by visualization dumps and the PP2S/REAL debugging outputs.
"""

from __future__ import annotations

import sys
from typing import List, Optional, Sequence

import numpy as np

_PLY_DTYPES = {
    np.dtype("int8"): "char",
    np.dtype("uint8"): "uchar",
    np.dtype("int16"): "short",
    np.dtype("uint16"): "ushort",
    np.dtype("int32"): "int",
    np.dtype("uint32"): "uint",
    np.dtype("float32"): "float",
    np.dtype("float64"): "double",
}
_INV_PLY_DTYPES = {v: k for k, v in _PLY_DTYPES.items()}
# aliases used in the wild
_INV_PLY_DTYPES.update(
    {
        "float32": np.dtype("float32"),
        "float64": np.dtype("float64"),
        "int32": np.dtype("int32"),
        "uint32": np.dtype("uint32"),
        "int16": np.dtype("int16"),
        "uint16": np.dtype("uint16"),
        "int8": np.dtype("int8"),
        "uint8": np.dtype("uint8"),
    }
)


def write_ply(
    filename: str,
    field_list: Sequence[np.ndarray],
    field_names: Sequence[str],
    triangular_faces: Optional[np.ndarray] = None,
) -> bool:
    """Write named point fields (each (N,) or (N, k)) as binary PLY."""
    if not filename.endswith(".ply"):
        filename += ".ply"
    fields = []
    for f in field_list:
        f = np.asarray(f)
        if f.ndim == 1:
            f = f[:, None]
        fields.append(f)
    n = fields[0].shape[0]
    assert all(f.shape[0] == n for f in fields), "field row counts differ"
    assert sum(f.shape[1] for f in fields) == len(field_names), (
        "field_names count must match total columns"
    )

    endianness = "binary_little_endian" if sys.byteorder == "little" else (
        "binary_big_endian"
    )
    with open(filename, "wb") as fh:
        header = ["ply", f"format {endianness} 1.0", f"element vertex {n}"]
        i = 0
        for f in fields:
            for _ in range(f.shape[1]):
                header.append(
                    f"property {_PLY_DTYPES[f.dtype]} {field_names[i]}"
                )
                i += 1
        if triangular_faces is not None:
            header.append(f"element face {triangular_faces.shape[0]}")
            header.append("property list uchar int vertex_indices")
        header.append("end_header")
        fh.write(("\n".join(header) + "\n").encode("ascii"))

        rec_dtype = []
        i = 0
        for f in fields:
            for c in range(f.shape[1]):
                rec_dtype.append((field_names[i], f.dtype))
                i += 1
        data = np.empty(n, dtype=rec_dtype)
        i = 0
        for f in fields:
            for c in range(f.shape[1]):
                data[field_names[i]] = f[:, c]
                i += 1
        data.tofile(fh)

        if triangular_faces is not None:
            faces = np.asarray(triangular_faces, np.int32)
            rec = np.empty(
                faces.shape[0],
                dtype=[("k", np.uint8), ("v1", np.int32), ("v2", np.int32),
                       ("v3", np.int32)],
            )
            rec["k"] = 3
            rec["v1"], rec["v2"], rec["v3"] = faces[:, 0], faces[:, 1], faces[:, 2]
            rec.tofile(fh)
    return True


def read_ply(filename: str, triangular_mesh: bool = False):
    """Read a binary PLY written by ``write_ply`` (or compatible). Returns
    a structured array of vertex properties (and faces if requested)."""
    with open(filename, "rb") as fh:
        line = fh.readline().strip()
        if line != b"ply":
            raise ValueError("not a ply file")
        fmt = None
        num_points = 0
        num_faces = 0
        props: List = []
        current_element = None
        while True:
            line = fh.readline().strip().decode("ascii")
            if line == "end_header":
                break
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "format":
                fmt = parts[1]
            elif parts[0] == "element":
                current_element = parts[1]
                if parts[1] == "vertex":
                    num_points = int(parts[2])
                elif parts[1] == "face":
                    num_faces = int(parts[2])
            elif parts[0] == "property" and current_element == "vertex":
                props.append((parts[2], _INV_PLY_DTYPES[parts[1]]))
        assert fmt and fmt.startswith("binary"), "only binary ply supported"
        vertex = np.fromfile(fh, dtype=np.dtype(props), count=num_points)
        if triangular_mesh and num_faces:
            face_dtype = np.dtype(
                [("k", np.uint8), ("v1", np.int32), ("v2", np.int32),
                 ("v3", np.int32)]
            )
            faces_rec = np.fromfile(fh, dtype=face_dtype, count=num_faces)
            faces = np.stack(
                [faces_rec["v1"], faces_rec["v2"], faces_rec["v3"]], axis=1
            )
            return vertex, faces
        return vertex
