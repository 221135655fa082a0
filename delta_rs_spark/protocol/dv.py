"""Spec-conformant Delta deletion vectors (RoaringBitmap format).

Implements the PUBLIC Delta protocol's deletion-vector representation so
tables written by this engine are readable by any conformant Delta reader:

- descriptor on add/remove: ``{storageType: "u"|"i"|"p", pathOrInlineDv,
  offset?, sizeInBytes, cardinality}``;
- on-disk DV file: ``<version byte = 1>`` then one or more DVs, each
  framed as ``<dataSize: 4B big-endian> <data> <CRC-32(data): 4B
  big-endian>`` where ``data = <magic 1681511377: 4B little-endian>
  <portable 64-bit RoaringBitmap>``; a descriptor's ``offset`` points at
  its frame's dataSize field, ``sizeInBytes`` is the dataSize value;
- ``storageType "u"``: pathOrInlineDv = ``<prefix><z85(uuid)>``; the file
  lives at ``<tableRoot>/<prefix>/deletion_vector_<uuid>.bin``;
- ``storageType "i"``: pathOrInlineDv = z85 of the framed-less ``data``
  (magic + bitmap) — no file at all, ideal for point deletes;
- ``storageType "p"``: absolute file path.

Bitmap serialization is the published RoaringFormatSpec: the 64-bit
"portable" layout (8-byte LE bucket count, then per bucket a 4-byte LE
high key + a standard 32-bit roaring bitmap). The writer emits the
no-run-container format (cookie 12346) with array or bitset containers;
the reader additionally understands run containers (cookie 12347) so DV
files produced by other engines decode too.

The legacy descriptor this engine wrote before round 3
(``{storageType: "d", paths: [...position-parquet dirs]}``) remains
readable — see ``is_legacy`` — but is never written anymore.

Everything here is driver-or-executor pure Python over bounded data:
deletion vectors are kilobytes-to-megabytes by design (sparse deletes);
bulk deletes take the copy-on-write path instead (see ``dml.py``).
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib
from dataclasses import dataclass
from typing import Any, Iterable, Optional

DV_MAGIC = 1681511377
DV_FORMAT_VERSION = 1

# inline descriptors avoid a file round-trip for point deletes; past this
# many bytes of bitmap the DV goes to a .bin file
INLINE_MAX_BYTES = 1024

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE_RUN = 12347
_ARRAY_TO_BITSET_THRESHOLD = 4096

# ---------------------------------------------------------------------------
# Z85 (the base85 variant the Delta spec mandates for pathOrInlineDv)
# ---------------------------------------------------------------------------

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_DECODE = {c: i for i, c in enumerate(_Z85_ALPHABET)}


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError("z85 input must be a multiple of 4 bytes")
    out = []
    for i in range(0, len(data), 4):
        value = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            value, rem = divmod(value, 85)
            chunk.append(_Z85_ALPHABET[rem])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("z85 input must be a multiple of 5 chars")
    out = bytearray()
    for i in range(0, len(text), 5):
        value = 0
        for c in text[i : i + 5]:
            value = value * 85 + _Z85_DECODE[c]
        out += value.to_bytes(4, "big")
    return bytes(out)


# ---------------------------------------------------------------------------
# RoaringBitmap (portable 64-bit) serialization
# ---------------------------------------------------------------------------

def serialize_roaring64(positions: Iterable[int]) -> bytes:
    """Sorted-unique positions → portable 64-bit roaring bytes (no-run
    format: every container is an array (<4096 values) or a 8KB bitset)."""
    buckets: dict[int, list[int]] = {}
    for p in sorted(set(positions)):
        if p < 0:
            raise ValueError(f"negative row position {p}")
        buckets.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)

    out = bytearray(struct.pack("<Q", len(buckets)))
    for high in sorted(buckets):
        out += struct.pack("<I", high)
        out += _serialize_roaring32(buckets[high])
    return bytes(out)


def _serialize_roaring32(values: list[int]) -> bytes:
    containers: dict[int, list[int]] = {}
    for v in values:  # already sorted
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)

    keys = sorted(containers)
    out = bytearray(struct.pack("<I", _SERIAL_COOKIE_NO_RUN))
    out += struct.pack("<I", len(keys))
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    # offsets (from the start of the 32-bit serialization): the layout is
    # cookie(4) + size(4) + descriptive header (4 per container) + offset
    # header (4 per container), so container data begins at 8 + 8k
    data_start = 4 + 4 + 4 * len(keys) + 4 * len(keys)
    offsets, pos = [], data_start
    blobs = []
    for k in keys:
        vals = containers[k]
        # roaring spec boundary: cardinality <= 4096 is an ARRAY container
        # (the reader side and every external reader use the same rule; a
        # bitset at exactly 4096 would be misdecoded as an array)
        if len(vals) <= _ARRAY_TO_BITSET_THRESHOLD:
            blob = struct.pack(f"<{len(vals)}H", *vals)
        else:
            bits = bytearray(8192)
            for v in vals:
                bits[v >> 3] |= 1 << (v & 7)
            blob = bytes(bits)
        offsets.append(pos)
        blobs.append(blob)
        pos += len(blob)
    for off in offsets:
        out += struct.pack("<I", off)
    for blob in blobs:
        out += blob
    return bytes(out)


def deserialize_roaring64(data: bytes) -> list[int]:
    """Portable 64-bit roaring bytes → sorted positions. Understands array,
    bitset, and run containers (both cookies), so DVs from other engines
    decode too."""
    (n_buckets,) = struct.unpack_from("<Q", data, 0)
    pos = 8
    out: list[int] = []
    for _ in range(n_buckets):
        (high,) = struct.unpack_from("<I", data, pos)
        pos += 4
        values, consumed = _deserialize_roaring32(data[pos:])
        base = high << 32
        out.extend(base | v for v in values)
        pos += consumed
    return out


def _deserialize_roaring32(data: bytes) -> tuple[list[int], int]:
    (cookie32,) = struct.unpack_from("<I", data, 0)
    cookie = cookie32 & 0xFFFF
    if cookie == _SERIAL_COOKIE_RUN:
        n_containers = (cookie32 >> 16) + 1
        pos = 4
        n_run_bytes = (n_containers + 7) // 8
        run_flags = data[pos : pos + n_run_bytes]
        pos += n_run_bytes
        has_offsets = n_containers >= 4
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n_containers,) = struct.unpack_from("<I", data, 4)
        pos = 8
        run_flags = b"\x00" * ((n_containers + 7) // 8)
        has_offsets = True
    else:
        raise ValueError(f"unknown roaring cookie {cookie}")

    headers = []
    for i in range(n_containers):
        key, card_m1 = struct.unpack_from("<HH", data, pos)
        pos += 4
        headers.append((key, card_m1 + 1))
    if has_offsets:
        pos += 4 * n_containers  # reader walks sequentially; offsets unused

    values: list[int] = []
    for i, (key, card) in enumerate(headers):
        base = key << 16
        is_run = bool(run_flags[i // 8] & (1 << (i % 8)))
        if is_run:
            (n_runs,) = struct.unpack_from("<H", data, pos)
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", data, pos)
                pos += 4
                values.extend(base | v for v in range(start, start + length + 1))
        elif card <= _ARRAY_TO_BITSET_THRESHOLD:
            vals = struct.unpack_from(f"<{card}H", data, pos)
            pos += 2 * card
            values.extend(base | v for v in vals)
        else:
            chunk = data[pos : pos + 8192]
            pos += 8192
            for byte_i, byte in enumerate(chunk):
                while byte:
                    bit = byte & -byte
                    values.append(base | (byte_i << 3) | bit.bit_length() - 1)
                    byte &= byte - 1
    return values, pos


# ---------------------------------------------------------------------------
# DV file framing + descriptors
# ---------------------------------------------------------------------------

@dataclass
class DvBlob:
    """One serialized DV and where it sits in its (future) file."""

    data: bytes  # magic + roaring64
    offset: Optional[int]  # position of the dataSize field; None for inline
    cardinality: int


def frame_dv_file(position_sets: list[list[int]]) -> tuple[bytes, list[DvBlob]]:
    """Pack several DVs into one .bin file body (shared per commit, like
    the reference implementations): returns (file bytes, per-DV blobs with
    offsets)."""
    body = bytearray([DV_FORMAT_VERSION])
    blobs: list[DvBlob] = []
    for positions in position_sets:
        data = struct.pack("<I", DV_MAGIC) + serialize_roaring64(positions)
        offset = len(body)
        body += struct.pack(">I", len(data))
        body += data
        body += struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
        blobs.append(DvBlob(data=data, offset=offset, cardinality=len(set(positions))))
    return bytes(body), blobs


def read_dv_at(file_bytes: bytes, offset: int, size_in_bytes: int) -> list[int]:
    """Decode one DV from file bytes at its descriptor's offset."""
    (data_size,) = struct.unpack_from(">I", file_bytes, offset)
    if data_size != size_in_bytes:
        raise ValueError(
            f"DV frame dataSize {data_size} != descriptor sizeInBytes {size_in_bytes}"
        )
    data = file_bytes[offset + 4 : offset + 4 + data_size]
    (crc,) = struct.unpack_from(">I", file_bytes, offset + 4 + data_size)
    if crc != (zlib.crc32(data) & 0xFFFFFFFF):
        raise ValueError("DV checksum mismatch")
    (magic,) = struct.unpack_from("<I", data, 0)
    if magic != DV_MAGIC:
        raise ValueError(f"bad DV magic {magic}")
    return deserialize_roaring64(data[4:])


def make_descriptor_uuid() -> tuple[str, str]:
    """(z85-encoded uuid for pathOrInlineDv, relative file path)."""
    u = _uuid.uuid4()
    return z85_encode(u.bytes), f"deletion_vector_{u}.bin"


def dv_file_rel_path(path_or_inline: str) -> str:
    """storageType "u" pathOrInlineDv → log-relative file path. The LAST 20
    chars are the z85 uuid; anything before is a directory prefix."""
    prefix, encoded = path_or_inline[:-20], path_or_inline[-20:]
    u = _uuid.UUID(bytes=z85_decode(encoded))
    name = f"deletion_vector_{u}.bin"
    return f"{prefix.rstrip('/')}/{name}" if prefix else name


def is_legacy(descriptor: dict[str, Any]) -> bool:
    """True for this engine's pre-round-3 parquet-dir descriptor."""
    return descriptor.get("storageType") == "d"


def is_spec(descriptor: dict[str, Any]) -> bool:
    return descriptor.get("storageType") in ("u", "i", "p")


def decode_descriptor(descriptor: dict[str, Any], get_file_bytes) -> list[int]:
    """Spec descriptor → sorted positions. ``get_file_bytes(rel_or_abs_path)
    -> bytes`` supplies file contents (storage-backend injected)."""
    st = descriptor["storageType"]
    if st == "i":
        data = z85_decode(descriptor["pathOrInlineDv"])
        (magic,) = struct.unpack_from("<I", data, 0)
        if magic != DV_MAGIC:
            raise ValueError(f"bad inline DV magic {magic}")
        return deserialize_roaring64(data[4:])
    if st == "u":
        path = dv_file_rel_path(descriptor["pathOrInlineDv"])
    elif st == "p":
        path = descriptor["pathOrInlineDv"]
    else:
        raise ValueError(f"not a spec DV descriptor: {descriptor!r}")
    file_bytes = get_file_bytes(path)
    # a single-DV file may omit offset: the DV starts right after the
    # version byte (None-valued keys from checkpoint decode behave the same)
    offset = descriptor.get("offset")
    return read_dv_at(
        file_bytes, int(offset) if offset is not None else 1, int(descriptor["sizeInBytes"])
    )


def build_descriptors(
    per_file_positions: dict[str, list[int]],
) -> tuple[dict[str, dict[str, Any]], Optional[tuple[str, bytes]]]:
    """Per-(add path) position lists → per-path spec descriptors, plus the
    one shared .bin file to publish (or None if everything inlined).

    Small bitmaps inline (storageType "i"); the rest share a single
    uuid-named file (storageType "u") with per-DV offsets.
    """
    inline: dict[str, dict[str, Any]] = {}
    filed: list[tuple[str, list[int]]] = []
    for path, positions in per_file_positions.items():
        data = struct.pack("<I", DV_MAGIC) + serialize_roaring64(positions)
        if len(data) <= INLINE_MAX_BYTES:
            inline[path] = {
                "storageType": "i",
                "pathOrInlineDv": z85_encode(_pad4(data)),
                "sizeInBytes": len(data),
                "cardinality": len(set(positions)),
            }
        else:
            filed.append((path, positions))

    if not filed:
        return inline, None

    file_body, blobs = frame_dv_file([p for _, p in filed])
    encoded_uuid, rel_name = make_descriptor_uuid()
    descriptors = dict(inline)
    for (path, _), blob in zip(filed, blobs):
        descriptors[path] = {
            "storageType": "u",
            "pathOrInlineDv": encoded_uuid,
            "offset": blob.offset,
            "sizeInBytes": len(blob.data),
            "cardinality": blob.cardinality,
        }
    return descriptors, (rel_name, file_body)


def _pad4(data: bytes) -> bytes:
    """Z85 needs 4-byte alignment; trailing zero padding is harmless — the
    roaring deserializer stops at its own length fields."""
    pad = (-len(data)) % 4
    return data + b"\x00" * pad


# ---------------------------------------------------------------------------
# log-aware helpers (shared by scan, DML, CDF, vacuum)
# ---------------------------------------------------------------------------

def referenced_rel_paths(descriptor: dict[str, Any]) -> tuple[list[str], list[str]]:
    """(dir prefixes, exact file paths) of storage this descriptor pins —
    legacy descriptors reference whole position-parquet dirs, spec "u"
    descriptors one .bin file, inline descriptors nothing."""
    if is_legacy(descriptor):
        return list(descriptor.get("paths") or []), []
    if descriptor.get("storageType") == "u":
        return [], [dv_file_rel_path(descriptor["pathOrInlineDv"])]
    return [], []


def descriptor_positions(log, descriptor: dict[str, Any], add_path: str) -> list[int]:
    """Sorted deleted row positions for one add, either format.

    Bounded driver-side work by design: a DV holds the sparse-delete
    positions of ONE file (kilobytes to low megabytes — the same in-memory
    materialization every Delta reader performs per file)."""
    if is_legacy(descriptor):
        import pyarrow.dataset as ds

        out: set[int] = set()
        basename = add_path.rsplit("/", 1)[-1]
        for d in descriptor.get("paths") or []:
            local = log.data_plane.readable_dir(d)
            tbl = ds.dataset(local, format="parquet").to_table(columns=["path", "row_index"])
            for p, ri in zip(
                tbl.column("path").to_pylist(), tbl.column("row_index").to_pylist()
            ):
                if p == add_path or p.rsplit("/", 1)[-1] == basename:
                    out.add(ri)
        return sorted(out)

    def get_bytes(rel_or_abs: str) -> bytes:
        if "://" in rel_or_abs:
            # absolute URI (a shallow clone's source DV, possibly a
            # different scheme than this table): resolve its own backend
            from .storage import parse_table_uri

            normalized, backend = parse_table_uri(rel_or_abs)
            return backend.get_obj(normalized)
        if rel_or_abs.startswith("/"):
            with open(rel_or_abs, "rb") as fh:
                return fh.read()
        return log.backend.get_obj(log.backend.join(log.table_root, rel_or_abs))

    return decode_descriptor(descriptor, get_bytes)


def descriptor_positions_for_root(
    table_root: str, descriptor: dict[str, Any]
) -> list[int]:
    """Executor-side decode of a SPEC descriptor ('u'/'i'/'p'): sorted
    deleted positions, self-contained — rebuilds the storage backend from
    the table root string instead of needing the driver's Log object.

    This is the scale path for streaming scans over DV'd tables: a batch
    that plans 10k DV'd files ships 10k small descriptor dicts and decodes
    each bitmap ON THE EXECUTOR that reads the file, instead of decoding
    10k bitmaps serially on the driver at planning time and shipping the
    (much larger) position lists. Legacy parquet-dir descriptors ('d')
    still decode at planning time — they need the log's data plane."""
    if not is_spec(descriptor):
        raise ValueError(
            f"executor-side decode supports spec descriptors only, got "
            f"storageType={descriptor.get('storageType')!r}"
        )

    def get_bytes(rel_or_abs: str) -> bytes:
        from .storage import parse_table_uri

        if "://" in rel_or_abs:
            normalized, backend = parse_table_uri(rel_or_abs)
            return backend.get_obj(normalized)
        if rel_or_abs.startswith("/"):
            with open(rel_or_abs, "rb") as fh:
                return fh.read()
        root, backend = parse_table_uri(table_root)
        return backend.get_obj(backend.join(root, rel_or_abs))

    return decode_descriptor(descriptor, get_bytes)


def add_positions(log, add) -> list[int]:
    """Memoized ``descriptor_positions`` for an AddAction (stats-style
    per-instance cache: pruning/scan/CDF may ask repeatedly)."""
    cached = add.__dict__.get("_dv_positions_cache")
    if cached is not None:
        return cached
    positions = descriptor_positions(log, add.deletion_vector, add.path)
    add.__dict__["_dv_positions_cache"] = positions
    return positions


def positions_df(spark, log, dv_adds, key_fn=None):
    """Spark DataFrame ``(_dv_path, _dv_pos)`` of every deleted position of
    ``dv_adds`` — the positions side of the scan's anti join. Decodes
    driver-side (bounded, see ``descriptor_positions``) and ships one
    Arrow-backed literal frame; the join strategy (broadcast vs shuffle) is
    the caller's call based on descriptor sizeInBytes. ``key_fn(add)``
    overrides the join key (default ``add.path``) — the scan passes the
    value its lineage column actually evaluates to, which differs from the
    log path for absolute-path (shallow-clone) adds."""
    import pandas as pd

    paths: list[str] = []
    pos: list[int] = []
    for a in dv_adds:
        p = add_positions(log, a)
        key = key_fn(a) if key_fn is not None else a.path
        paths.extend([key] * len(p))
        pos.extend(p)
    pdf = pd.DataFrame({"_dv_path": pd.array(paths, dtype="string"), "_dv_pos": pd.array(pos, dtype="int64")})
    return spark.createDataFrame(pdf, schema="_dv_path STRING, _dv_pos BIGINT")
