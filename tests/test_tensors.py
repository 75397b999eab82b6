"""SafeTensors / NPY / NPZ walks (operators/tensors.py): layout
validation, the no-eval header parser, numpy interop, totality."""

from __future__ import annotations

import io
import struct

import pytest

from mit_6_5840_mapreduce_with_go_spark.operators import tensors as X


def test_safetensors_roundtrip_and_layout_rules():
    pay = X._st_payload(7)
    m = X.decode_safetensors(pay)
    assert m["n_tensors"] == 2 + 7 % 3
    assert m["metadata"] == {"format": "pt", "doc": "7"}
    # non-dense layout rejected: bump one begin offset
    import json
    (hlen,) = struct.unpack("<Q", pay[:8])
    hdr = json.loads(pay[8 : 8 + hlen])
    name = next(k for k in hdr if k != "__metadata__")
    hdr[name]["data_offsets"][0] += 1
    hdr[name]["data_offsets"][1] += 1
    hj = json.dumps(hdr).encode()
    bad = struct.pack("<Q", len(hj)) + hj + pay[8 + hlen :]
    with pytest.raises(ValueError, match="dense|out of bounds|cover"):
        X.decode_safetensors(bad)
    # shape/offsets mismatch rejected
    hdr = json.loads(pay[8 : 8 + hlen])
    hdr[name]["shape"][0] += 1
    hj = json.dumps(hdr).encode()
    bad = struct.pack("<Q", len(hj)) + hj + pay[8 + hlen :]
    with pytest.raises(ValueError, match="elements of"):
        X.decode_safetensors(bad)
    with pytest.raises(ValueError, match="unknown dtype"):
        X.decode_safetensors(
            X.encode_safetensors([("a", "F32", [1], b"\x00" * 4)]).replace(
                b"F32", b"Q99"
            )
        )


def test_npy_numpy_interop():
    """Our walk agrees with numpy's own writer AND our writer loads in
    numpy — both directions, including 2-D and negative ints."""
    import numpy as np

    arr = np.arange(-5, 7, dtype="<i8").reshape(3, 4)
    buf = io.BytesIO()
    np.save(buf, arr)
    m = X.decode_npy(buf.getvalue())
    assert m["shape"] == (3, 4) and m["descr"] == "<i8"
    assert m["values"] == list(range(-5, 7))
    ours = X.encode_npy("<i8", (6,), b"".join(
        int(v).to_bytes(8, "little", signed=True) for v in range(6)
    ))
    back = np.load(io.BytesIO(ours))
    assert back.tolist() == list(range(6))


def test_npy_header_parser_rejects_hostile():
    good = X.encode_npy("<i8", (2,), b"\x00" * 16)
    with pytest.raises(ValueError, match="bad magic"):
        X.decode_npy(b"\x93NUMPZ" + good[6:])
    # header parser is not eval: expression payloads are rejected
    evil = good.replace(b"'shape': (2,)", b"'shape': (9**9,)")
    with pytest.raises(ValueError, match="non-integer shape|data section"):
        X.decode_npy(evil)
    with pytest.raises(ValueError, match="unsupported descr"):
        X.decode_npy(good.replace(b"<i8", b"<c16"))
    with pytest.raises(ValueError, match="data section"):
        X.decode_npy(good[:-1])


def test_npz_composition():
    pay = X._npz_payload(5)
    arrs = X.decode_npz(pay)
    assert len(arrs) == 1 + 5 % 3
    for a, m in arrs.items():
        assert m["descr"] == "<i8" and m["values"] is not None
    # a non-npy member poisons the npz
    from mit_6_5840_mapreduce_with_go_spark.operators.multimodal9 import (
        encode_zip,
    )

    with pytest.raises(ValueError, match="non-npy member"):
        X.decode_npz(encode_zip([("readme.txt", b"hi", False)]))


def test_payload_formulas():
    for doc_id in (0, 1, 2, 499):
        m = X.decode_safetensors(X._st_payload(doc_id))
        assert m["n_tensors"] == 2 + doc_id % 3
        arrs = X.decode_npz(X._npz_payload(doc_id))
        vals = [v for a in arrs.values() for v in a["values"]]
        want = [
            (doc_id * 5 + a * 3 + j) % 1000 - 100
            for a in range(1 + doc_id % 3)
            for j in range(4 + (doc_id + a) % 6)
        ]
        assert sorted(vals) == sorted(want)


def test_totality():
    for pay, fn in (
        (X._st_payload(3), X.decode_safetensors),
        (X._npz_payload(3), X.decode_npz),
    ):
        for ln in range(len(pay)):
            try:
                fn(pay[:ln])
            except ValueError:
                pass
        for pos in range(0, len(pay), 2):
            for flip in (0x01, 0x80):
                mut = bytearray(pay)
                mut[pos] ^= flip
                try:
                    fn(bytes(mut))
                except ValueError:
                    pass
