"""OSM PBF source: pure-Python protobuf wire decode + distributed Spark read.

Parity with the reference's scan stage (mod.rs:273-281 BlobReader loop,
mod.rs:199-200 zlib inflate + PrimitiveBlock decode), re-expressed for
Spark: instead of re-reading the file three times and round-robining
blobs over threads (mod.rs:187-191), we scan the blob index once
(driver-side, header-only sequential read), parallelize the (offset,
size) ranges, and decode each compressed blob inside ``mapInPandas``
workers — one scan, executor-parallel, no driver materialization of
entity data. Works against any storage the executors can open.

No external protobuf library: the OSM PBF wire format is decoded by
hand (varints, zigzag, packed fields), which keeps the sandbox
dependency-free and the hot loop simple enough to stay fast for
fixture-scale files. At 100 TB scale the same blob-range strategy
holds; only the per-blob decode would move to a vectorized decoder.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field
from typing import Dict, Iterable, Iterator, List, Tuple

# --- protobuf wire primitives -------------------------------------------------


def _varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_no, wire_type, value). value: int for varint(0)/fixed,
    bytes for length-delimited(2)."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _varint(buf, pos)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, pos = _varint(buf, pos)
            yield fno, wt, v
        elif wt == 2:
            ln, pos = _varint(buf, pos)
            yield fno, wt, buf[pos : pos + ln]
            pos += ln
        elif wt == 1:
            yield fno, wt, struct.unpack_from("<q", buf, pos)[0]
            pos += 8
        elif wt == 5:
            yield fno, wt, struct.unpack_from("<i", buf, pos)[0]
            pos += 4
        else:  # pragma: no cover
            raise ValueError(f"unsupported wire type {wt}")


def _packed_varints(buf: bytes, zig: bool = False) -> List[int]:
    out = []
    pos = 0
    n = len(buf)
    while pos < n:
        v, pos = _varint(buf, pos)
        out.append(_zigzag(v) if zig else v)
    return out


def _packed_deltas(buf: bytes) -> List[int]:
    vals = _packed_varints(buf, zig=True)
    acc = 0
    out = []
    for v in vals:
        acc += v
        out.append(acc)
    return out


# --- blob framing -------------------------------------------------------------


@dataclass
class BlobRef:
    """Byte range of one blob in the file (decode unit for executors)."""

    blob_type: str
    offset: int  # offset of the blob payload (after BlobHeader)
    size: int


def scan_blob_index(path: str) -> List[BlobRef]:
    """Sequential header-only scan: cheap (reads ~24 bytes per blob)."""
    refs: List[BlobRef] = []
    with open(path, "rb") as f:
        while True:
            lenbuf = f.read(4)
            if len(lenbuf) < 4:
                break
            (hlen,) = struct.unpack(">I", lenbuf)
            header = f.read(hlen)
            btype = ""
            datasize = 0
            for fno, _, v in _fields(header):
                if fno == 1:
                    btype = v.decode("utf-8")
                elif fno == 3:
                    datasize = v
            refs.append(BlobRef(btype, f.tell(), datasize))
            f.seek(datasize, 1)
    return refs


def read_blob(path: str, ref: BlobRef) -> bytes:
    """Read + inflate one blob payload into raw PrimitiveBlock bytes.

    Supports the raw (field 1) and zlib (field 3) encodings, i.e. what
    the OSM ecosystem actually writes. Any other registered Blob
    compression field (lzma=4, lz4=6, zstd=7, obsolete bzip2=5) raises
    instead of silently decoding an empty table."""
    with open(path, "rb") as f:
        f.seek(ref.offset)
        blob = f.read(ref.size)
    raw = None
    unsupported = []
    for fno, _, v in _fields(blob):
        if fno == 1:  # raw
            raw = v
        elif fno == 3:  # zlib_data
            raw = zlib.decompress(v)
        elif fno in (4, 5, 6, 7):  # lzma / bzip2 (obsolete) / lz4 / zstd
            unsupported.append(fno)
    if raw is None:
        detail = (
            f"unsupported Blob compression (fields {unsupported})"
            if unsupported
            else "no raw/zlib_data field present"
        )
        raise ValueError(f"cannot decode PBF blob at offset {ref.offset}: {detail}")
    return raw


# --- PrimitiveBlock decode -----------------------------------------------------

_INFO_KEYS = ("version", "timestamp", "changeset", "uid", "user", "visible")


@dataclass
class BlockEntities:
    nodes: List[dict] = field(default_factory=list)
    ways: List[dict] = field(default_factory=list)
    relations: List[dict] = field(default_factory=list)


def _decode_info(buf: bytes, strings: List[str], date_granularity: int) -> Dict[str, str]:
    """OSM element metadata -> string map, keys as in mod.rs:205-230."""
    info: Dict[str, str] = {}
    for fno, _, v in _fields(buf):
        if fno == 1:
            info["version"] = str(v)
        elif fno == 2:
            info["timestamp"] = str(v * date_granularity // 1000)
        elif fno == 3:
            info["changeset"] = str(v)
        elif fno == 4:
            info["uid"] = str(v)
        elif fno == 5:
            info["user"] = strings[v]
        elif fno == 6:
            info["visible"] = "true" if v else "false"
    return info


def decode_block(data: bytes) -> BlockEntities:
    """Decode one PrimitiveBlock into node/way/relation dicts.

    Output schema mirrors the reference cache structs (mod.rs:21-43):
    nodes {id, lat, lon, tags}; ways {id, tags, info, refs};
    relations {id, tags, info, members:[(role, member_id, type)]}.
    """
    strings: List[str] = []
    groups: List[bytes] = []
    granularity = 100
    date_granularity = 1000
    lat_offset = 0
    lon_offset = 0
    for fno, _, v in _fields(data):
        if fno == 1:
            strings = [s.decode("utf-8") for f2, _, s in _fields(v) if f2 == 1]
        elif fno == 2:
            groups.append(v)
        elif fno == 17:
            granularity = v
        elif fno == 18:
            date_granularity = v
        elif fno == 19:
            lat_offset = v
        elif fno == 20:
            lon_offset = v

    out = BlockEntities()
    coord = 1e-9

    def to_lat(raw: int) -> float:
        return coord * (lat_offset + granularity * raw)

    def to_lon(raw: int) -> float:
        return coord * (lon_offset + granularity * raw)

    for group in groups:
        for fno, _, v in _fields(group):
            if fno == 1:  # plain Node
                nid = 0
                keys: List[int] = []
                vals: List[int] = []
                rawlat = rawlon = 0
                for f2, _, v2 in _fields(v):
                    if f2 == 1:
                        nid = _zigzag(v2)
                    elif f2 == 2:
                        keys = _packed_varints(v2)
                    elif f2 == 3:
                        vals = _packed_varints(v2)
                    elif f2 == 8:
                        rawlat = _zigzag(v2)
                    elif f2 == 9:
                        rawlon = _zigzag(v2)
                out.nodes.append(
                    {
                        "id": nid,
                        "lat": to_lat(rawlat),
                        "lon": to_lon(rawlon),
                        "tags": {strings[k]: strings[w] for k, w in zip(keys, vals)},
                    }
                )
            elif fno == 2:  # DenseNodes
                ids: List[int] = []
                lats: List[int] = []
                lons: List[int] = []
                kvs: List[int] = []
                for f2, _, v2 in _fields(v):
                    if f2 == 1:
                        ids = _packed_deltas(v2)
                    elif f2 == 8:
                        lats = _packed_deltas(v2)
                    elif f2 == 9:
                        lons = _packed_deltas(v2)
                    elif f2 == 10:
                        kvs = _packed_varints(v2)
                tag_maps: List[Dict[str, str]] = []
                if kvs:
                    cur: Dict[str, str] = {}
                    i = 0
                    while i < len(kvs):
                        if kvs[i] == 0:
                            tag_maps.append(cur)
                            cur = {}
                            i += 1
                        else:
                            cur[strings[kvs[i]]] = strings[kvs[i + 1]]
                            i += 2
                for j, nid in enumerate(ids):
                    out.nodes.append(
                        {
                            "id": nid,
                            "lat": to_lat(lats[j]),
                            "lon": to_lon(lons[j]),
                            "tags": tag_maps[j] if j < len(tag_maps) else {},
                        }
                    )
            elif fno == 3:  # Way
                wid = 0
                keys = []
                vals = []
                refs: List[int] = []
                info: Dict[str, str] = {}
                for f2, _, v2 in _fields(v):
                    if f2 == 1:
                        wid = v2
                    elif f2 == 2:
                        keys = _packed_varints(v2)
                    elif f2 == 3:
                        vals = _packed_varints(v2)
                    elif f2 == 4:
                        info = _decode_info(v2, strings, date_granularity)
                    elif f2 == 8:
                        refs = _packed_deltas(v2)
                out.ways.append(
                    {
                        "id": wid,
                        "tags": {strings[k]: strings[w] for k, w in zip(keys, vals)},
                        "info": info,
                        "refs": refs,
                    }
                )
            elif fno == 4:  # Relation
                rid = 0
                keys = []
                vals = []
                roles: List[int] = []
                memids: List[int] = []
                types: List[int] = []
                info = {}
                for f2, _, v2 in _fields(v):
                    if f2 == 1:
                        rid = v2
                    elif f2 == 2:
                        keys = _packed_varints(v2)
                    elif f2 == 3:
                        vals = _packed_varints(v2)
                    elif f2 == 4:
                        info = _decode_info(v2, strings, date_granularity)
                    elif f2 == 8:
                        roles = _packed_varints(v2)
                    elif f2 == 9:
                        memids = _packed_deltas(v2)
                    elif f2 == 10:
                        types = _packed_varints(v2)
                type_names = {0: "node", 1: "way", 2: "relation"}
                out.relations.append(
                    {
                        "id": rid,
                        "tags": {strings[k]: strings[w] for k, w in zip(keys, vals)},
                        "info": info,
                        "members": [
                            (strings[r], m, type_names.get(t, "?"))
                            for r, m, t in zip(roles, memids, types)
                        ],
                    }
                )
    return out


def read_pbf(path: str) -> BlockEntities:
    """Driver-side decode of a whole PBF file (fixture-scale use)."""
    all_out = BlockEntities()
    for ref in scan_blob_index(path):
        if ref.blob_type != "OSMData":
            continue
        block = decode_block(read_blob(path, ref))
        all_out.nodes.extend(block.nodes)
        all_out.ways.extend(block.ways)
        all_out.relations.extend(block.relations)
    return all_out


# --- PBF encode (writer) -------------------------------------------------------
# Minimal OSM-PBF writer for the formats the reader supports: DenseNodes,
# Ways, Relations, zlib blobs. Primary uses: self-contained round-trip
# verification of the wire decoder (the `pbf_decode` driver query needs
# no external .pbf file) and a PBF sink for engine entity tables.


def _enc_varint(v: int) -> bytes:
    out = bytearray()
    v &= (1 << 64) - 1
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _enc_field(fno: int, payload: bytes) -> bytes:
    """Length-delimited field (wire type 2)."""
    return _enc_varint((fno << 3) | 2) + _enc_varint(len(payload)) + payload


def _enc_vfield(fno: int, v: int) -> bytes:
    """Varint field (wire type 0)."""
    return _enc_varint(fno << 3) + _enc_varint(v)


def _enc_packed(fno: int, vals, zig: bool = False, delta: bool = False) -> bytes:
    buf = bytearray()
    prev = 0
    for v in vals:
        x = int(v)
        if delta:
            x, prev = x - prev, x
        if zig:
            x = _enc_zigzag(x)
        buf += _enc_varint(x)
    return _enc_field(fno, bytes(buf))


class _StringTable:
    def __init__(self):
        self._idx = {"": 0}
        self._strings = [""]

    def get(self, s: str) -> int:
        i = self._idx.get(s)
        if i is None:
            i = len(self._strings)
            self._idx[s] = i
            self._strings.append(s)
        return i

    def encode(self) -> bytes:
        return b"".join(
            _enc_field(1, s.encode("utf-8")) for s in self._strings
        )


def _enc_block(nodes, ways, relations) -> bytes:
    """One PrimitiveBlock: DenseNodes + Ways + Relations groups.
    granularity=100 (raw = round(deg * 1e7)), offsets 0."""
    st = _StringTable()
    groups = []
    if nodes:
        ids = [n["id"] for n in nodes]
        lats = [round(n["lat"] * 1e7) for n in nodes]
        lons = [round(n["lon"] * 1e7) for n in nodes]
        kvs = []
        for n in nodes:
            for k, v in n.get("tags", {}).items():
                kvs += [st.get(k), st.get(v)]
            kvs.append(0)
        dense = (
            _enc_packed(1, ids, zig=True, delta=True)
            + _enc_packed(8, lats, zig=True, delta=True)
            + _enc_packed(9, lons, zig=True, delta=True)
        )
        if any(n.get("tags") for n in nodes):
            dense += _enc_packed(10, kvs)
        groups.append(_enc_field(2, dense))
    way_msgs = b""
    for wy in ways:
        msg = _enc_vfield(1, wy["id"])
        tags = wy.get("tags", {})
        if tags:
            msg += _enc_packed(2, [st.get(k) for k in tags])
            msg += _enc_packed(3, [st.get(v) for v in tags.values()])
        msg += _enc_packed(8, wy["refs"], zig=True, delta=True)
        way_msgs += _enc_field(3, msg)
    if way_msgs:
        groups.append(way_msgs)
    rel_msgs = b""
    type_ids = {"node": 0, "way": 1, "relation": 2}
    for rel in relations:
        msg = _enc_vfield(1, rel["id"])
        tags = rel.get("tags", {})
        if tags:
            msg += _enc_packed(2, [st.get(k) for k in tags])
            msg += _enc_packed(3, [st.get(v) for v in tags.values()])
        members = rel.get("members", [])
        if members:
            msg += _enc_packed(8, [st.get(role) for role, _, _ in members])
            msg += _enc_packed(9, [m for _, m, _ in members], zig=True, delta=True)
            msg += _enc_packed(10, [type_ids[t] for _, _, t in members])
        rel_msgs += _enc_field(4, msg)
    if rel_msgs:
        groups.append(rel_msgs)
    block = _enc_field(1, st.encode())
    for g in groups:
        block += _enc_field(2, g)
    block += _enc_vfield(17, 100)  # granularity
    return block


def _enc_blob(btype: str, raw: bytes) -> bytes:
    z = zlib.compress(raw)
    blob = _enc_vfield(2, len(raw)) + _enc_field(3, z)
    header = _enc_field(1, btype.encode()) + _enc_vfield(3, len(blob))
    return struct.pack(">I", len(header)) + header + blob


def write_pbf(
    path: str,
    nodes: Iterable[dict] = (),
    ways: Iterable[dict] = (),
    relations: Iterable[dict] = (),
    entities_per_block: int = 8000,
) -> int:
    """Write entities to an OSM-PBF file readable by :func:`read_pbf` /
    :func:`read_pbf_spark` (and by the reference's osmpbf stack — same
    wire format). Entities use the decoder's dict schema: nodes
    {id, lat, lon, tags}; ways {id, tags, refs}; relations {id, tags,
    members: [(role, member_id, type)]}. Returns the blob count.

    Entities are chunked ``entities_per_block`` per PrimitiveBlock so a
    multi-block file exercises the blob index and gives the
    distributed reader real parallelism.
    """
    nodes, ways, relations = list(nodes), list(ways), list(relations)
    header = _enc_field(4, b"DenseNodes")  # required_features
    blobs = [_enc_blob("OSMHeader", header)]

    def chunks(xs):
        for i in range(0, len(xs), entities_per_block):
            yield xs[i : i + entities_per_block]

    for chunk in chunks(nodes):
        blobs.append(_enc_blob("OSMData", _enc_block(chunk, [], [])))
    for chunk in chunks(ways):
        blobs.append(_enc_blob("OSMData", _enc_block([], chunk, [])))
    for chunk in chunks(relations):
        blobs.append(_enc_blob("OSMData", _enc_block([], [], chunk)))
    with open(path, "wb") as f:
        for b in blobs:
            f.write(b)
    return len(blobs)


# --- Spark distributed read ----------------------------------------------------

NODES_DDL = "id BIGINT, lat DOUBLE, lon DOUBLE, tags MAP<STRING,STRING>"
WAYS_DDL = (
    "id BIGINT, tags MAP<STRING,STRING>, info MAP<STRING,STRING>, refs ARRAY<BIGINT>"
)
RELATIONS_DDL = (
    "id BIGINT, tags MAP<STRING,STRING>, info MAP<STRING,STRING>, "
    "way_refs ARRAY<BIGINT>, stop_refs ARRAY<BIGINT>"
)


def read_pbf_spark(spark, path: str, parallelism: int | None = None):
    """Distributed PBF read: one header scan, executor-side blob decode.

    Returns (nodes, ways, relations) DataFrames with the engine's entity
    schemas (SURVEY.md §1.4). Relation members are split role-blind into
    way_refs / stop_refs, order preserved (mod.rs:242-252 semantics).
    """
    import pandas as pd

    refs = [r for r in scan_blob_index(path) if r.blob_type == "OSMData"]
    if parallelism is None:
        parallelism = max(1, min(len(refs), spark.sparkContext.defaultParallelism))
    # parallelize straight to `parallelism` slices: skips both the
    # defaultParallelism fan-out of a bare createDataFrame (32 Python
    # tasks for a handful of blob refs) and the repartition shuffle it
    # would take to fix up afterwards.
    ref_df = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(path, r.offset, r.size) for r in refs], parallelism
        ),
        "path STRING, offset BIGINT, size BIGINT",
    )

    def _decode_nodes(batches):
        for pdf in batches:
            rows = []
            for p, off, size in zip(pdf["path"], pdf["offset"], pdf["size"]):
                b = decode_block(read_blob(p, BlobRef("OSMData", int(off), int(size))))
                rows.extend((x["id"], x["lat"], x["lon"], x["tags"]) for x in b.nodes)
            yield pd.DataFrame(rows, columns=["id", "lat", "lon", "tags"])

    def _decode_ways(batches):
        for pdf in batches:
            rows = []
            for p, off, size in zip(pdf["path"], pdf["offset"], pdf["size"]):
                b = decode_block(read_blob(p, BlobRef("OSMData", int(off), int(size))))
                rows.extend((x["id"], x["tags"], x["info"], x["refs"]) for x in b.ways)
            yield pd.DataFrame(rows, columns=["id", "tags", "info", "refs"])

    def _decode_relations(batches):
        for pdf in batches:
            rows = []
            for p, off, size in zip(pdf["path"], pdf["offset"], pdf["size"]):
                b = decode_block(read_blob(p, BlobRef("OSMData", int(off), int(size))))
                for x in b.relations:
                    way_refs = [m[1] for m in x["members"] if m[2] == "way"]
                    stop_refs = [m[1] for m in x["members"] if m[2] == "node"]
                    rows.append((x["id"], x["tags"], x["info"], way_refs, stop_refs))
            yield pd.DataFrame(
                rows, columns=["id", "tags", "info", "way_refs", "stop_refs"]
            )

    nodes = ref_df.mapInPandas(_decode_nodes, NODES_DDL)
    ways = ref_df.mapInPandas(_decode_ways, WAYS_DDL)
    relations = ref_df.mapInPandas(_decode_relations, RELATIONS_DDL)
    return nodes, ways, relations
