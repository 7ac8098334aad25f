"""Spec-derived byte-golden test for the vendored JNRT writer
(VERDICT r5 item 6, adapted to this environment).

The real ``nested_ragged_tensors`` + ``safetensors`` libraries are not
installable here (no pip), so the golden bytes are constructed by an
INDEPENDENT implementation inside this test — pure json/struct, no code
shared with sources/_jnrt_numpy.py — following the public rules:

1. safetensors container (huggingface/safetensors format README +
   tensor.rs serialize): ``u64le header_len | JSON header (space-padded
   to an 8-byte boundary) | raw little-endian C-contiguous buffers``;
   tensors serialized in descending-dtype-then-name order.
2. JNRT's flat dim-keyed tensor schema (mmcdermott/nested_ragged_tensors
   ragged_numpy.py; reference transforms/tensorization.py:16-106):
   ``dim{n}/{key}`` flattened values + shared ``dim{n}/bounds`` cumsum.

What this proves: the vendored writer's bytes are a pure function of the
documented public format, not of its own implementation choices — any
writer bug that bends the container (offsets, padding, ordering, dtype
tags, bounds arithmetic) fails this test even though the writer's own
reader would happily round-trip the bent file. What it cannot prove
here: that the transcription of the ordering rule matches the Rust
serializer binary (needs the real library; the library-present branch of
test_sources_and_pipeline.py covers that wherever it can run).
"""

from __future__ import annotations

import json
import struct

import numpy as np

from meds_polars_functions_spark.sources._jnrt_numpy import (
    load_jnrt_dense,
    save_jnrt,
)

# one static patient batch: two dim-1 co-ragged columns (i64 + f64) —
# the tokenized-MEDS shape the reference sink writes
COLUMNS = {
    "code": [[101, 7, 9], [3], []],
    "numeric_value": [[0.5, -1.25, float(2**53)], [3.75], []],
}


def _golden_bytes() -> bytes:
    # --- independent JNRT tensor construction -------------------------
    flat_code = [101, 7, 9, 3]
    flat_val = [0.5, -1.25, float(2**53), 3.75]
    bounds = [3, 4, 4]  # cumsum of row lengths (3, 1, 0)
    # --- independent safetensors serialization ------------------------
    # descending dtype then name: I64 ("dim1/bounds", "dim1/code")
    # before F64 ("dim1/numeric_value")
    tensors = [
        ("dim1/bounds", "I64", [3], struct.pack("<3q", *bounds)),
        ("dim1/code", "I64", [4], struct.pack("<4q", *flat_code)),
        ("dim1/numeric_value", "F64", [4], struct.pack("<4d", *flat_val)),
    ]
    header: dict[str, dict] = {}
    off = 0
    for name, tag, shape, buf in tensors:
        header[name] = {
            "dtype": tag,
            "shape": shape,
            "data_offsets": [off, off + len(buf)],
        }
        off += len(buf)
    hjson = json.dumps(header, separators=(",", ":")).encode()
    hjson += b" " * ((8 - len(hjson) % 8) % 8)
    return (
        struct.pack("<Q", len(hjson))
        + hjson
        + b"".join(buf for *_x, buf in tensors)
    )


def test_jnrt_writer_matches_spec_golden_bytes(tmp_path):
    path = str(tmp_path / "golden.nrt")
    save_jnrt(COLUMNS, path)
    with open(path, "rb") as f:
        got = f.read()
    assert got == _golden_bytes()


def test_golden_header_is_aligned_and_parseable():
    b = _golden_bytes()
    (hlen,) = struct.unpack("<Q", b[:8])
    assert hlen % 8 == 0  # spec: data section 8-byte aligned
    header = json.loads(b[8 : 8 + hlen].decode())
    assert set(header) == {"dim1/bounds", "dim1/code", "dim1/numeric_value"}
    # offsets contiguous from 0 in serialization order
    ends = [m["data_offsets"] for m in header.values()]
    assert ends[0][0] == 0
    assert len(b) == 8 + hlen + ends[-1][1]


def test_vendored_reader_roundtrips_the_golden_file(tmp_path):
    path = str(tmp_path / "golden.nrt")
    with open(path, "wb") as f:
        f.write(_golden_bytes())
    dense = load_jnrt_dense(path)
    assert dense["code"] == COLUMNS["code"]
    assert dense["numeric_value"] == COLUMNS["numeric_value"]


def test_two_level_bounds_bytes(tmp_path):
    """dim-2 layout: outer bounds at dim1, inner at dim2 — byte-compare
    the bounds tensors against hand-computed cumsums."""
    cols = {"code": [[[1, 2], [3]], [[4]]]}
    path = str(tmp_path / "two.nrt")
    save_jnrt(cols, path)
    with open(path, "rb") as f:
        raw = f.read()
    (hlen,) = struct.unpack("<Q", raw[:8])
    header = json.loads(raw[8 : 8 + hlen].decode())
    data = raw[8 + hlen :]

    def tensor_bytes(name):
        lo, hi = header[name]["data_offsets"]
        return data[lo:hi]

    assert tensor_bytes("dim1/bounds") == struct.pack("<2q", 2, 3)
    assert tensor_bytes("dim2/bounds") == struct.pack("<3q", 2, 3, 4)
    assert tensor_bytes("dim2/code") == struct.pack("<4q", 1, 2, 3, 4)
    assert np.array_equal(
        load_jnrt_dense(path)["code"], np.array(cols["code"], dtype=object)
    ) or load_jnrt_dense(path)["code"] == cols["code"]
