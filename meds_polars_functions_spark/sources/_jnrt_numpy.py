"""Vendored pure-numpy writer/reader for the public
``JointNestedRaggedTensorDict`` on-disk container.

The reference tensorization sink (reference
transforms/tensorization.py:16-106) writes ``.nrt`` files via the public
``nested_ragged_tensors`` package (mmcdermott/nested_ragged_tensors,
``ragged_numpy.py``). That package is optional and pure-Python but absent
in some environments; this module reimplements — from the PUBLIC on-disk
format only — the minimal subset needed to emit and validate compatible
files with no dependency beyond numpy:

1. The container is a **safetensors** file (huggingface/safetensors
   public spec): ``u64le header_len | JSON header | raw little-endian
   C-contiguous tensor bytes``, where the JSON maps tensor name →
   ``{"dtype", "shape", "data_offsets"}``.
2. The tensor-name schema is JNRT's flat dim-keyed layout:
   - ``dim{n}/{key}``: the depth-``n`` ragged column's values, flattened
     to 1-D (n = number of ragged nesting levels, 1-based);
   - ``dim{n}/bounds``: ``np.cumsum`` of the lengths at nesting level n
     (shared by every column of that depth — JNRT requires equal-depth
     columns to be co-ragged, as tokenized MEDS event sequences are).

``save_jnrt`` + ``load_jnrt`` round-trip through that layout;
``load_jnrt_dense`` re-nests to per-row python lists for validation.
When the real library IS installed, tests assert it loads these files
(sources/writers.py prefers the library for writing in that case).
"""

from __future__ import annotations

import json
import struct

import numpy as np

# safetensors dtype tags <-> numpy (little-endian), public spec table
_DTYPES = {
    "F64": "<f8",
    "F32": "<f4",
    "F16": "<f2",
    "I64": "<i8",
    "I32": "<i4",
    "I16": "<i2",
    "I8": "|i1",
    "U8": "|u1",
    "U16": "<u2",
    "U32": "<u4",
    "U64": "<u8",
    "BOOL": "|b1",
}
_NP_TO_TAG = {np.dtype(v): k for k, v in _DTYPES.items()}

#: Serializer tensor order, transcribed from the PUBLIC safetensors
#: serializer (huggingface/safetensors tensor.rs ``serialize``): tensors
#: are sorted by DESCENDING dtype (enum order — wider/aligned types
#: first) then ASCENDING name, and the JSON header is padded with
#: spaces to an 8-byte boundary so the data section is aligned. Both
#: rules reproduced here so the vendored writer's bytes match what the
#: reference stack (nested_ragged_tensors -> safetensors.numpy) emits;
#: readers are offset-driven, so any deviation would cost only
#: bit-identity, never loadability.
#: NOTE (ADVICE r7 item 4): the public enum also has BF16 and the F8
#: variants, which numpy cannot express — their slots sit BETWEEN I32
#: and F16 in the descending order below. They are omitted here because
#: _NP_TO_TAG can never produce them (unsupported dtypes raise TypeError
#: first); if dtype support ever grows, insert them at that enum
#: position, not at the end. The transcription of the ordering rule is
#: unverified against the real Rust serializer in this environment —
#: tests/test_jnrt_golden.py pins spec-derived bytes, and the
#: library-present parity test is authoritative wherever the package is
#: installable.
_TAG_RANK = {
    t: i
    for i, t in enumerate(
        ["U64", "I64", "F64", "F32", "U32", "I32", "F16", "U16", "I16",
         "I8", "U8", "BOOL"]
    )
}


def save_safetensors(tensors: dict[str, np.ndarray], path: str) -> None:
    """Spec-conformant safetensors writer: contiguous little-endian
    buffers, serializer tensor ordering (descending dtype, then name),
    space-padded 8-byte-aligned header."""
    header: dict[str, dict] = {}
    bufs: list[bytes] = []
    off = 0

    def _tag(a: np.ndarray) -> str:
        tag = _NP_TO_TAG.get(np.dtype(a.dtype.str.lstrip("=<>|")))
        if tag is None:
            raise TypeError(f"unsupported dtype for safetensors: {a.dtype}")
        return tag

    ordered = sorted(
        tensors.items(), key=lambda kv: (_TAG_RANK[_tag(np.ascontiguousarray(kv[1]))], kv[0])
    )
    for name, arr in ordered:
        a = np.ascontiguousarray(arr)
        if a.dtype.byteorder == ">":
            a = a.astype(a.dtype.newbyteorder("<"))
        tag = _NP_TO_TAG.get(np.dtype(a.dtype.str.lstrip("=<>|")))
        if tag is None:
            raise TypeError(f"unsupported dtype for safetensors: {a.dtype} ({name})")
        b = a.tobytes()
        header[name] = {
            "dtype": tag,
            "shape": list(a.shape),
            "data_offsets": [off, off + len(b)],
        }
        bufs.append(b)
        off += len(b)
    hjson = json.dumps(header, separators=(",", ":")).encode("utf-8")
    hjson += b" " * ((8 - len(hjson) % 8) % 8)  # spec: 8-byte-aligned data
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for b in bufs:
            f.write(b)


def load_safetensors(path: str) -> dict[str, np.ndarray]:
    with open(path, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hlen).decode("utf-8"))
        buf = f.read()
    out: dict[str, np.ndarray] = {}
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        lo, hi = meta["data_offsets"]
        arr = np.frombuffer(buf[lo:hi], dtype=_DTYPES[meta["dtype"]])
        out[name] = arr.reshape(meta["shape"])
    return out


def _depth(col: list) -> int:
    """Ragged nesting depth of a python-list column: 1 for list-of-
    scalars rows, 2 for list-of-list rows."""
    for row in col:
        for el in row or []:
            return 2 if isinstance(el, (list, tuple, np.ndarray)) else 1
    return 1  # all-empty: treat as singly ragged


def jnrt_tensors(columns: dict[str, list]) -> dict[str, np.ndarray]:
    """Build the flat dim-keyed tensor dict from per-row ragged python
    lists (every column: one entry per row; depth 1 or 2). Equal-depth
    columns must be co-ragged (same lengths), as in tokenized MEDS."""
    out: dict[str, np.ndarray] = {}
    bounds_by_dim: dict[int, np.ndarray] = {}
    for key, col in columns.items():
        d = _depth(col)
        if d == 1:
            lengths = np.asarray([len(r or []) for r in col], dtype=np.int64)
            flat = np.asarray(
                [v for r in col for v in (r or [])]
            )
            dim = 1
        else:
            outer_lengths = np.asarray([len(r or []) for r in col], dtype=np.int64)
            inner = [s for r in col for s in (r or [])]
            lengths = np.asarray([len(s or []) for s in inner], dtype=np.int64)
            flat = np.asarray([v for s in inner for v in (s or [])])
            # the OUTER raggedness registers at dim 1
            b1 = np.cumsum(outer_lengths)
            prev = bounds_by_dim.get(1)
            if prev is not None and not np.array_equal(prev, b1):
                raise ValueError(f"column {key!r} is not co-ragged at dim 1")
            bounds_by_dim[1] = b1
            dim = 2
        b = np.cumsum(lengths)
        prev = bounds_by_dim.get(dim)
        if prev is not None and not np.array_equal(prev, b):
            raise ValueError(f"column {key!r} is not co-ragged at dim {dim}")
        bounds_by_dim[dim] = b
        if flat.dtype == object:  # all-empty column: give it a real dtype
            flat = flat.astype(np.float64)
        out[f"dim{dim}/{key}"] = flat
    for dim, b in sorted(bounds_by_dim.items()):
        out[f"dim{dim}/bounds"] = b
    return out


def save_jnrt(columns: dict[str, list], path: str) -> None:
    save_safetensors(jnrt_tensors(columns), path)


def load_jnrt(path: str) -> dict[str, np.ndarray]:
    return load_safetensors(path)


def load_jnrt_dense(path: str) -> dict[str, list]:
    """Re-nest a JNRT file back to per-row python lists (validation /
    small-scale consumption; the flat arrays are the scale interface)."""
    t = load_safetensors(path)
    dims = sorted(
        {int(k.split("/")[0][3:]) for k in t if k.endswith("/bounds")}
    )
    out: dict[str, list] = {}

    def split(flat: np.ndarray, bounds: np.ndarray) -> list:
        return [a.tolist() for a in np.split(flat, bounds[:-1])] if len(bounds) else []

    for k, arr in t.items():
        dim_s, _, key = k.partition("/")
        if key == "bounds":
            continue
        d = int(dim_s[3:])
        nested = split(arr, t[f"dim{d}/bounds"])
        # wrap through outer bounds until we reach dim 1
        for outer in range(d - 1, 0, -1):
            b = t[f"dim{outer}/bounds"]
            starts = np.concatenate(([0], b[:-1]))
            nested = [nested[s:e] for s, e in zip(starts, b)]
        out[key] = nested
    return out
