"""Spec deletion-vector format: Z85, portable RoaringBitmap, file framing.

Pins the public Delta DV representation (protocol/dv.py) with round-trip
and format-shape tests, including the public Z85 test vector, so a
conformant foreign reader would decode exactly what this engine writes.
"""

from __future__ import annotations

import struct
import uuid

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from delta_rs_spark.protocol import dv


def test_z85_public_test_vector():
    # the Z85 spec's own test case: bytes 86 4F D2 6F B5 59 F7 5B -> "HelloWorld"
    data = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert dv.z85_encode(data) == "HelloWorld"
    assert dv.z85_decode("HelloWorld") == data


@given(st.binary(min_size=0, max_size=64).map(lambda b: b + b"\x00" * ((-len(b)) % 4)))
def test_z85_roundtrip(data):
    assert dv.z85_decode(dv.z85_encode(data)) == data


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40),
        min_size=0,
        max_size=500,
    )
)
@settings(max_examples=50, deadline=None)
def test_roaring64_roundtrip(positions):
    blob = dv.serialize_roaring64(positions)
    assert dv.deserialize_roaring64(blob) == sorted(set(positions))


def test_roaring_bitset_container_roundtrip():
    # > 4096 values in one 16-bit container forces the 8KB bitset encoding
    positions = list(range(0, 10000, 2))
    blob = dv.serialize_roaring64(positions)
    assert dv.deserialize_roaring64(blob) == positions
    (cookie,) = struct.unpack_from("<I", blob, 12)  # after count+high key
    assert cookie == 12346  # no-run cookie


def test_roaring_run_container_decodes():
    """Foreign writers may emit run containers (cookie 12347): build one by
    hand and confirm the reader expands it."""
    # one container, run flag set, runs [5..9] and [100..102]
    body = struct.pack("<I", (12347 & 0xFFFF) | (0 << 16))  # 1 container
    body += bytes([0x01])  # run flag bitset
    body += struct.pack("<HH", 0, 8 - 1)  # key 0, cardinality 8
    body += struct.pack("<H", 2)  # 2 runs
    body += struct.pack("<HH", 5, 4)  # 5 + 4 more = 5..9
    body += struct.pack("<HH", 100, 2)  # 100..102
    blob = struct.pack("<Q", 1) + struct.pack("<I", 0) + body
    assert dv.deserialize_roaring64(blob) == [5, 6, 7, 8, 9, 100, 101, 102]


def test_multi_bucket_64bit_positions():
    positions = [3, 2**32 + 1, 2**33 + 7, 5]
    assert dv.deserialize_roaring64(dv.serialize_roaring64(positions)) == sorted(positions)


def test_file_framing_and_read_back():
    sets = [[1, 2, 3], list(range(5000)), [9]]
    body, blobs = dv.frame_dv_file(sets)
    assert body[0] == dv.DV_FORMAT_VERSION
    for positions, blob in zip(sets, blobs):
        got = dv.read_dv_at(body, blob.offset, len(blob.data))
        assert got == sorted(set(positions))
        assert blob.cardinality == len(set(positions))


def test_frame_checksum_detects_corruption():
    body, blobs = dv.frame_dv_file([[1, 2, 3]])
    corrupted = bytearray(body)
    corrupted[10] ^= 0xFF
    with pytest.raises(ValueError, match="checksum|magic|dataSize"):
        dv.read_dv_at(bytes(corrupted), blobs[0].offset, len(blobs[0].data))


def test_uuid_path_derivation_roundtrip():
    encoded, rel = dv.make_descriptor_uuid()
    assert len(encoded) == 20
    assert dv.dv_file_rel_path(encoded) == rel
    # a prefixed pathOrInlineDv keeps the prefix as a directory
    u = uuid.uuid4()
    enc = dv.z85_encode(u.bytes)
    assert dv.dv_file_rel_path(f"ab/{enc}") == f"ab/deletion_vector_{u}.bin"


def test_build_descriptors_inlines_small_and_files_large():
    per_file = {
        "part-a.parquet": [1, 5, 7],  # tiny -> inline
        "part-b.parquet": list(range(0, 60000, 3)),  # 20k positions -> file
    }
    descriptors, file_out = dv.build_descriptors(per_file)
    a, b = descriptors["part-a.parquet"], descriptors["part-b.parquet"]
    assert a["storageType"] == "i"
    assert a["cardinality"] == 3
    assert b["storageType"] == "u"
    assert b["cardinality"] == 20000
    assert file_out is not None
    rel_name, body = file_out
    assert rel_name == dv.dv_file_rel_path(b["pathOrInlineDv"])

    store = {rel_name: body}
    assert dv.decode_descriptor(a, store.__getitem__) == [1, 5, 7]
    assert dv.decode_descriptor(b, store.__getitem__) == list(range(0, 60000, 3))


def test_build_descriptors_all_inline_writes_no_file():
    descriptors, file_out = dv.build_descriptors({"p": [2, 4]})
    assert file_out is None
    assert descriptors["p"]["storageType"] == "i"


def test_legacy_descriptor_detection():
    assert dv.is_legacy({"storageType": "d", "paths": ["x"]})
    assert not dv.is_legacy({"storageType": "u"})
    assert dv.is_spec({"storageType": "u"})
    assert dv.is_spec({"storageType": "i"})
    assert not dv.is_spec({"storageType": "d"})


def test_roaring_array_bitset_boundary_at_4096():
    """Roaring spec: cardinality <= 4096 is an ARRAY container. A bitset at
    exactly 4096 would be misdecoded (by us AND external readers)."""
    from delta_rs_spark.protocol.dv import (
        deserialize_roaring64,
        serialize_roaring64,
    )

    for card in (4095, 4096, 4097):
        pos = list(range(card))
        assert deserialize_roaring64(serialize_roaring64(pos)) == pos
    # exact-4096 serializes as an array: 2 bytes per value, not an 8KB bitset
    data = serialize_roaring64(list(range(4096)))
    assert len(data) < 8500


def test_roaring_offset_header_points_at_container_data():
    """External readers seek via the offset header; each offset must point
    at the container's actual byte position."""
    import struct

    from delta_rs_spark.protocol.dv import serialize_roaring64

    # two containers in one high-32 bucket: 100-value array + 50-value array
    pos = list(range(100)) + [65536 + i for i in range(50)]
    r32 = serialize_roaring64(pos)[12:]  # skip bucket count + high key
    _cookie, k = struct.unpack_from("<II", r32, 0)
    assert k == 2
    offsets = [struct.unpack_from("<I", r32, 8 + 4 * k + 4 * i)[0] for i in range(k)]
    data_start = 8 + 8 * k
    assert offsets == [data_start, data_start + 200]  # 100 uint16 = 200 bytes
    # and the bytes AT the first offset are the first container's values
    vals = struct.unpack_from("<5H", r32, offsets[0])
    assert list(vals) == [0, 1, 2, 3, 4]
