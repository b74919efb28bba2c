"""Gaussian map <-> PLY, attribute-compatible with the reference export
(gaussian_model.py:569-620 save_ply / :637-731 load_ply): x y z nx ny nz
f_dc_0..2 opacity scale_0..2 rot_0..3 plus the dygs dynamic-flag channel.
Binary little-endian, written with numpy structured arrays (no plyfile
dependency). Only alive slots are exported."""

from __future__ import annotations

import numpy as np

_PROPS = (
    ["x", "y", "z", "nx", "ny", "nz"]
    + [f"f_dc_{i}" for i in range(3)]
    + ["opacity"]
    + [f"scale_{i}" for i in range(3)]
    + [f"rot_{i}" for i in range(4)]
    + ["dygs"]
)


def save_gaussians_ply(gmap, path: str) -> int:
    alive = np.asarray(gmap.alive)
    xyz = np.asarray(gmap.params.xyz)[alive]
    f_dc = np.asarray(gmap.params.f_dc)[alive]
    opacity = np.asarray(gmap.params.opacity)[alive][:, 0]
    scaling = np.asarray(gmap.params.scaling)[alive]
    rotation = np.asarray(gmap.params.rotation)[alive]
    dygs = np.asarray(gmap.dygs)[alive].astype(np.float32)
    n = xyz.shape[0]

    dtype = [(p, "<f4") for p in _PROPS]
    data = np.zeros(n, dtype=dtype)
    data["x"], data["y"], data["z"] = xyz.T
    for i in range(3):
        data[f"f_dc_{i}"] = f_dc[:, i]
        data[f"scale_{i}"] = scaling[:, i]
    data["opacity"] = opacity
    for i in range(4):
        data[f"rot_{i}"] = rotation[:, i]
    data["dygs"] = dygs

    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        + "".join(f"property float {p}\n" for p in _PROPS)
        + "end_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(data.tobytes())
    return n


def load_gaussians_ply(path: str):
    """Returns dict of numpy arrays (xyz, f_dc, opacity, scaling,
    rotation, dygs). Parses the subset of PLY this repo (and the
    reference) writes plus reference files without a dygs channel."""
    with open(path, "rb") as f:
        header = b""
        while not header.endswith(b"end_header\n"):
            header += f.readline()
        lines = header.decode("ascii").splitlines()
        n = 0
        props: list[str] = []
        for ln in lines:
            if ln.startswith("element vertex"):
                n = int(ln.split()[-1])
            elif ln.startswith("property float"):
                props.append(ln.split()[-1])
        dtype = np.dtype([(p, "<f4") for p in props])
        data = np.frombuffer(f.read(n * dtype.itemsize), dtype=dtype)

    def col(name, default=0.0):
        if name in props:
            return np.asarray(data[name])
        return np.full(n, default, np.float32)

    out = {
        "xyz": np.stack([col("x"), col("y"), col("z")], -1),
        "f_dc": np.stack([col(f"f_dc_{i}") for i in range(3)], -1),
        "opacity": col("opacity")[:, None],
        "scaling": np.stack([col(f"scale_{i}") for i in range(3)], -1),
        "rotation": np.stack([col(f"rot_{i}", 1.0 if i == 0 else 0.0) for i in range(4)], -1),
        "dygs": col("dygs") > 0.5,
    }
    return out
