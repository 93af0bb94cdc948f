"""One-time converter: reference test fixtures → .npz artifacts.

The reference pins its golden kernel tests against literal CSC matrices
stored as Julia source (``test/test.jl``, ``ref_S_test.jl``, ``thing.jl``,
``randlap.jl``, ``onetoall.jl``, ``ref_R.jl``), a text splitting vector
(``ref_split_test.txt``) and two JLD2 (HDF5) files.  These are *data*, PyAMG-
equivalent golden outputs (survey §4.1) — converted here once into .npz files
committed under ``tests/fixtures/`` so the repo is standalone.

Usage:  python tests/fixtures/convert_fixtures.py /root/reference/test
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

import numpy as np
import scipy.sparse as sp


def parse_julia_csc(path: Path) -> sp.csc_matrix:
    text = path.read_text()

    def grab(name):
        m = re.search(rf"{name}\s*=\s*\[(.*?)\]", text, re.S)
        if not m:
            raise ValueError(f"{name} not found in {path}")
        return np.array(
            [float(t) for t in re.split(r"[,\s]+", m.group(1).strip()) if t],
        )

    mm = re.search(r"Gm\s*,\s*Gn\s*=\s*(\d+)\s*,\s*(\d+)", text)
    m, n = int(mm.group(1)), int(mm.group(2))
    colptr = grab("Gcolptr").astype(np.int64) - 1
    rowval = grab("Growval").astype(np.int64) - 1
    nzval = grab("Gnzval")
    return sp.csc_matrix((nzval, rowval, colptr), shape=(m, n))


def read_jld2_csc(h5file, name) -> sp.csc_matrix:
    import h5py

    obj = h5file[name][()]
    m, n = int(obj["m"]), int(obj["n"])
    colptr = np.asarray(h5file[obj["colptr"]]) - 1
    rowval = np.asarray(h5file[obj["rowval"]]) - 1
    nzval = np.asarray(h5file[obj["nzval"]])
    return sp.csc_matrix((nzval, rowval, colptr), shape=(m, n))


def save_csc(path: Path, M: sp.csc_matrix, **extra):
    M = M.tocsc()
    np.savez_compressed(
        path,
        shape=np.array(M.shape),
        indptr=M.indptr,
        indices=M.indices,
        data=M.data,
        **extra,
    )


def main(ref_test_dir: str):
    ref = Path(ref_test_dir)
    out = Path(__file__).parent

    for name in ["test", "ref_S_test", "thing", "randlap", "onetoall", "ref_R"]:
        M = parse_julia_csc(ref / f"{name}.jl")
        save_csc(out / f"{name}.npz", M)
        print(name, M.shape, M.nnz)

    split = np.loadtxt(ref / "ref_split_test.txt").astype(np.int64)
    np.save(out / "ref_split.npy", split)
    print("ref_split", split.shape)

    import h5py

    with h5py.File(ref / "lin_elastic_2d.jld2", "r") as h:
        A = read_jld2_csc(h, "A")
        B = np.asarray(h["B"]).T  # Julia column-major: stored transposed
        b = np.asarray(h["b"])
        save_csc(out / "lin_elastic_2d.npz", A, B=B, b=b)
        print("lin_elastic_2d", A.shape, A.nnz, B.shape, b.shape)

    with h5py.File(ref / "bug.jld2", "r") as h:
        G = read_jld2_csc(h, "G")
        save_csc(out / "bug_graph.npz", G)
        print("bug_graph", G.shape, G.nnz)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/reference/test")
