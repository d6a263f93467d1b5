"""Anti-hang PROGRESS properties over every untrusted-byte container
parser (VERDICT r10 item 4).

The r10 WARC infinite loop (negative Content-Length moved the parse
position backwards) was found by outside advice, not by this repo's
hostile tests — the gap was a *progress* invariant: hostile-format
tests asserted WHAT a malformed input produces, never that the parse
TERMINATES. At 100 TB a crawl shard that hangs one executor task hangs
the whole stage, so non-termination is the worst malformed-input
outcome, strictly worse than a wrong error type.

This suite closes the gap two ways:

1. ``test_progress_under_mutation`` — a deterministic mutation battery
   (truncations, byte overwrites, 4-byte length-field kills, bit
   flips; seeded per parser, reproducible) over EVERY container
   parser. Each mutant parse runs under a watchdog thread: any result
   or exception within the budget passes; a live thread past it is a
   recorded stall.
2. ``test_stall_mutant_*`` — one deliberate position-stall mutant per
   parser family, built from each format's zero-advance knob (the
   length/size field a naive walk adds to the position unchecked).
   Writing this suite immediately caught a REAL one: tar's octal size
   field parsed through int(x, 8), which accepts a minus sign, and a
   crafted size of -0o1000 (= -512) made ``pos += 512 + size +
   ((-size) % 512)`` advance by exactly zero — an infinite loop in
   webdataset.tar_members (fixed alongside this test; the mutant here
   is its regression pin). The watchdog itself is proven able to catch
   a stall by ``test_watchdog_catches_stall``.

Parser inventory matches the shard-ingestion + multimodal codec
surface: WARC(.gz), ustar/WebDataset, ZIP(+zip64), JPEG (baseline/
progressive/color), PNG, PPM, WAV (PCM16/IMA-ADPCM/G.711), FLAC,
Ogg-Opus, Ogg-FLAC, MP4/ISO-BMFF, WebM/EBML, MJPEG + concatenated-PPM
frame sampling.
"""

from __future__ import annotations

import random
import struct
import threading
import time

import pytest

from trino_demo_spark.llm import flac as _flac
from trino_demo_spark.llm import jpeg as _jpeg
from trino_demo_spark.llm import mp4 as _mp4
from trino_demo_spark.llm import multimodal as _mm
from trino_demo_spark.llm import ogg as _ogg
from trino_demo_spark.llm import warc as _warc
from trino_demo_spark.llm import webdataset as _wds
from trino_demo_spark.llm import webm as _webm
from trino_demo_spark.llm import zipshard as _zip

# Generous per-mutant budget: every valid payload below parses in
# single-digit milliseconds, so 20s is ~3 orders of magnitude of
# headroom — a timeout is a stall, not a slow parse.
TIMEOUT_SEC = 20.0


def _run_watchdog(parse, payload, timeout=TIMEOUT_SEC) -> dict:
    """Run parse(payload) on a watchdog thread. Returns
    {stalled: bool, result|exc: ...}. Any exception counts as progress
    (the per-format hostile tests pin exception types; this suite pins
    TERMINATION)."""
    done: dict = {}

    def run():
        try:
            done["result"] = parse(payload)
        except BaseException as ex:  # noqa: BLE001 — any raise is progress
            done["exc"] = ex

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout)
    done["stalled"] = t.is_alive()
    return done


def _assert_terminates(parse, payload, what) -> dict:
    out = _run_watchdog(parse, payload)
    if out["stalled"]:
        pytest.fail(f"parser stalled (> {TIMEOUT_SEC}s) on {what}")
    return out


# ---------------------------------------------------------------- valid
# payload builders — one per parser family, all pure-stdlib encoders
# from the package itself (the same streams the roundtrip tests prove)


def _warc_recs():
    return [
        {
            "type": "warcinfo",
            "record_id": "<urn:uuid:1>",
            "date": "2024-01-01T00:00:00Z",
            "content_type": "application/warc-fields",
            "body": b"software: test\r\n",
        },
        {
            "type": "response",
            "record_id": "<urn:uuid:2>",
            "date": "2024-01-01T00:00:00Z",
            "uri": "https://a.example/x",
            "content_type": "application/http; msgtype=response",
            "body": _warc.encode_http_response(
                200, "OK", "text/plain", b"hello world body"
            ),
        },
    ]


def _tar_members_payload():
    return _wds.encode_tar(
        [
            ("000_0.ppm", b"P6\n2 1\n255\n" + bytes(6)),
            ("000_0.json", b'{"label": 3}'),
            ("000_1.txt", bytes(300)),
        ]
    )


PARSERS = [
    ("jpeg_gray", lambda: _jpeg.encode_jpeg_gray(9, 6, bytes(range(54))), _jpeg.decode_jpeg),
    (
        "jpeg_color",
        lambda: _jpeg.encode_jpeg_color(6, 5, bytes(range(90)), 90, "420"),
        _jpeg.decode_jpeg,
    ),
    (
        "jpeg_progressive",
        lambda: _jpeg.encode_jpeg_progressive(8, 8, bytes(range(64))),
        _jpeg.decode_jpeg,
    ),
    ("png_rgb", lambda: _mm.encode_png(3, 4, bytes(36), 3), _mm.decode_png),
    (
        "png_adam7",
        lambda: _mm.encode_png(5, 7, bytes(105), 3, interlace=True),
        _mm.decode_png,
    ),
    ("ppm", lambda: _mm.encode_ppm(4, 3, bytes(36)), _mm.decode_image),
    (
        "wav_pcm",
        lambda: _mm.encode_wav_pcm16([0, 100, -100, 500, -500], 16000),
        _mm.decode_audio,
    ),
    (
        "wav_adpcm",
        lambda: _mm.encode_wav_ima_adpcm([(i * 37) % 256 - 128 for i in range(64)]),
        _mm.decode_audio,
    ),
    (
        "wav_g711",
        lambda: _mm.encode_wav_g711([0, 1000, -1000, 30000], 8000, 1, "ulaw"),
        _mm.decode_audio,
    ),
    (
        "flac",
        lambda: _flac.encode_flac([[(i * 13) % 200 - 100 for i in range(300)]], 8000),
        _flac.decode_flac,
    ),
    (
        "ogg_opus",
        lambda: _ogg.encode_ogg_opus([bytes(100), bytes(200)], [960, 1920]),
        _ogg.ogg_demux,
    ),
    (
        "ogg_flac",
        lambda: _ogg.encode_ogg_flac(
            [[(i * 7) % 100 - 50 for i in range(300)]], 8000, block_size=256
        ),
        _ogg.decode_ogg_flac,
    ),
    (
        "mp4",
        lambda: _mp4.encode_mp4_samples(
            [_jpeg.encode_jpeg_gray(8, 8, bytes(64))] * 3, [500] * 3
        ),
        _mp4.mp4_demux,
    ),
    (
        "webm",
        lambda: _webm.encode_webm_frames(
            [_jpeg.encode_jpeg_gray(8, 8, bytes(64))] * 3, [0, 10, 20]
        ),
        _webm.webm_demux,
    ),
    (
        "mjpeg",
        lambda: _jpeg.encode_jpeg_gray(8, 8, bytes(64)) * 3,
        _mm.frame_sample,
    ),
    (
        "ppm_stream",
        lambda: _mm.encode_ppm_stream([(2, 2, bytes(12)), (2, 2, bytes(12))]),
        _mm.frame_sample,
    ),
    ("warc_gz", lambda: _warc.encode_warc_gz(_warc_recs()), _warc.warc_records),
    (
        "warc_plain",
        lambda: _warc.encode_warc_records(_warc_recs()),
        _warc.warc_records,
    ),
    ("tar", _tar_members_payload, _wds.tar_members),
    ("webdataset", _tar_members_payload, _wds.webdataset_samples),
    (
        "zip",
        lambda: _zip.encode_zip(
            [("a.bin", bytes(range(80)), False), ("b.bin", bytes(200), True)]
        ),
        _zip.zip_members,
    ),
]


@pytest.mark.parametrize(
    "name,build,parse", PARSERS, ids=[p[0] for p in PARSERS]
)
def test_progress_under_mutation(name, build, parse):
    """Deterministic mutation battery: every mutant parse must
    terminate (result or exception) under the watchdog."""
    payload = build()
    # the valid payload itself must parse (guards a broken builder)
    base = _assert_terminates(parse, payload, f"{name} valid payload")
    assert "exc" not in base, f"{name} valid payload raised {base.get('exc')!r}"

    rng = random.Random(f"anti-hang-{name}")
    n = len(payload)
    mutants: list[bytes] = []
    # truncations across the stream (headers, tables, bodies, tails)
    for frac in (0.02, 0.11, 0.23, 0.37, 0.5, 0.63, 0.77, 0.9, 0.97):
        mutants.append(payload[: int(n * frac)])
    # single-byte overwrites biased to boundary values
    for _ in range(60):
        i = rng.randrange(n)
        m = bytearray(payload)
        m[i] = rng.choice((0x00, 0xFF, 0x80, rng.randrange(256)))
        mutants.append(bytes(m))
    # 4-byte window kills — the length/size/count-field murder weapon
    for _ in range(20):
        i = rng.randrange(max(1, n - 4))
        for fill in (b"\x00\x00\x00\x00", b"\xff\xff\xff\xff", b"\x00\x00\x00\x01"):
            m = bytearray(payload)
            m[i : i + 4] = fill
            mutants.append(bytes(m))
    # single bit flips
    for _ in range(40):
        i = rng.randrange(n)
        m = bytearray(payload)
        m[i] ^= 1 << rng.randrange(8)
        mutants.append(bytes(m))

    for k, mutant in enumerate(mutants):
        _assert_terminates(parse, mutant, f"{name} mutant #{k}")


def test_watchdog_catches_stall():
    """The harness itself must catch a stall — a deliberate infinite
    parse must come back flagged, not hang the suite."""

    def staller(_payload):
        while True:
            time.sleep(0.01)

    out = _run_watchdog(staller, b"x", timeout=0.5)
    assert out["stalled"] is True


# ------------------------------------------------------- stall mutants
# One deliberate zero-advance mutant per parser family, each built
# from the format's own length/size knob. Every one must terminate;
# where the knob was an actual historical hang (warc r10, tar r11) the
# expected NotImplementedError is pinned explicitly.


def _tar_header(name: bytes, size_field: bytes) -> bytes:
    h = bytearray(512)
    h[0 : len(name)] = name
    h[124:136] = size_field.ljust(12, b"\x00")
    h[257:262] = b"ustar"
    h[148:156] = b" " * 8
    chk = sum(h)
    h[148:156] = ("%06o" % chk).encode() + b"\x00 "
    return bytes(h)


def test_stall_mutant_tar_negative_size():
    """REGRESSION (r11): octal size -0o1000 (= -512) made tar_members'
    position advance by exactly zero — int(x, 8) accepts a minus sign.
    This mutant looped forever before the fix."""
    payload = _tar_header(b"evil", b"-0000001000") + b"\x00" * 1024
    out = _assert_terminates(_wds.tar_members, payload, "tar size=-512")
    assert isinstance(out.get("exc"), NotImplementedError)
    # the backward-walk variant (size < -512 moves pos negative)
    payload = _tar_header(b"evil", b"-0000002000") + b"\x00" * 1024
    out = _assert_terminates(_wds.tar_members, payload, "tar size=-1024")
    assert isinstance(out.get("exc"), NotImplementedError)
    # non-octal size must be the declared contract, not ValueError
    payload = _tar_header(b"evil", b"notanumber!") + b"\x00" * 1024
    out = _assert_terminates(_wds.tar_members, payload, "tar size=garbage")
    assert isinstance(out.get("exc"), NotImplementedError)


def test_tar_blank_size_field_still_rejects():
    """REGRESSION (r11 review pass): unifying the octal parsers briefly
    gave the SIZE field the checksum's blank-means-zero tolerance, so a
    blank/NUL size header parsed as a 0-byte member instead of the
    declared reject — a silent reject→accept widening on hostile input.
    Both blank forms must stay NotImplementedError."""
    for size_field, label in [(b"", "NUL"), (b"        ", "spaces")]:
        payload = _tar_header(b"evil", size_field) + b"\x00" * 1024
        out = _assert_terminates(
            _wds.tar_members, payload, f"tar blank size ({label})"
        )
        assert isinstance(out.get("exc"), NotImplementedError), label


def test_stall_mutant_tar_python_int_leniencies():
    """Python's int(x, 8) accepts '0o' prefixes, '+' signs, and '_'
    separators, none of which is a tar numeral — a lenient parse reads
    the WRONG size and walks the archive misaligned (r11 review pass:
    strict octal-digit grammar)."""
    for size_field, label in [
        (b"0o000000010", "0o-prefix"),
        (b"+0000000010", "plus-sign"),
        (b"00000_00010", "underscore"),
    ]:
        payload = _tar_header(b"evil", size_field) + b"\x00" * 1024
        out = _assert_terminates(_wds.tar_members, payload, f"tar {label}")
        assert isinstance(out.get("exc"), NotImplementedError), label


def test_netpbm_python_int_leniencies_and_run_on_magic():
    """int() accepts '+12' and '1_2'; netpbm numerals are ASCII digits
    only. And the magic token must be exactly two bytes ('P6123 ...'
    is an invalid magic, not P6 with width 123)."""
    for header, label in [
        (b"P6\n+2 1\n255\n" + bytes(6), "plus-sign width"),
        (b"P6\n1_2 1\n255\n" + bytes(36), "underscore width"),
        (b"P6123 45 255 " + bytes(64), "run-on magic"),
    ]:
        out = _assert_terminates(_mm.decode_image, header, f"netpbm {label}")
        assert isinstance(out.get("exc"), NotImplementedError), label
    # the well-formed twin still parses (reject-path-only guarantee)
    ok = _mm.decode_image(b"P6\n2 1\n255\n" + bytes(6))
    assert ok["width"] == 2 and ok["height"] == 1


def test_stall_mutant_warc_negative_content_length():
    """REGRESSION (r10 ADVICE): a negative Content-Length sliced a
    negative body and moved the parse position backwards — the
    original infinite loop this suite generalizes."""
    payload = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"Content-Length: -1\r\n"
        b"\r\n"
    )
    out = _assert_terminates(_warc.warc_records, payload, "warc clen=-1")
    assert isinstance(out.get("exc"), NotImplementedError)


def test_stall_mutant_jpeg_zero_length_segment():
    """A marker segment with length 0 adds nothing to the position; the
    walk must fail on the next sync check, not respin. Both the
    decoder and the MJPEG boundary walk (jpeg_stream_end) take this
    path."""
    payload = b"\xff\xd8" + b"\xff\xe0\x00\x00" + b"\x00" * 64
    for parse, what in (
        (_jpeg.decode_jpeg, "decode_jpeg seglen=0"),
        (lambda p: _jpeg.jpeg_stream_end(p, 0), "jpeg_stream_end seglen=0"),
        (_mm.frame_sample, "frame_sample mjpeg seglen=0"),
    ):
        out = _assert_terminates(parse, payload, what)
        assert "exc" in out  # malformed: must raise, and must not hang


def test_stall_mutant_png_zero_length_chunk_run():
    """Zero-length chunks advance 12 bytes each — a run of 4096 of them
    must walk through in bounded time, not quadratically re-scan."""
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = _mm._png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    )
    filler = _mm._png_chunk(b"tEXt", b"") * 4096
    payload = sig + ihdr + filler  # no IDAT/IEND: must raise, not hang
    out = _assert_terminates(_mm.decode_png, payload, "png 4096 empty chunks")
    assert "exc" in out


def test_stall_mutant_mp4_size_zero_and_undersized_boxes():
    """ISO-BMFF size=0 means to-end-of-enclosure (must terminate the
    walk), size<8 is undersized (must raise — a naive pos += size
    respins forever on size in {0..7} mid-stream)."""
    valid = _mp4.encode_mp4_samples(
        [_jpeg.encode_jpeg_gray(8, 8, bytes(64))] * 2, [500] * 2
    )
    # first box size forced to 0: swallows the whole file as one box
    m = bytearray(valid)
    m[0:4] = b"\x00\x00\x00\x00"
    out = _assert_terminates(_mp4.mp4_demux, bytes(m), "mp4 size=0 first box")
    assert "exc" in out  # moov is now unreachable: raise, don't hang
    # a mid-stream box claiming size 4 (< header size 8)
    m = bytearray(valid)
    m[0:4] = struct.pack(">I", 4)
    out = _assert_terminates(_mp4.mp4_demux, bytes(m), "mp4 size=4 box")
    assert isinstance(out.get("exc"), NotImplementedError)


def test_stall_mutant_webm_zero_vint_and_unknown_size():
    """EBML vint first byte 0x00 encodes a >8-byte width (invalid
    here — must raise); an unknown-size element swallows to the end of
    the enclosure and must terminate the sibling walk."""
    valid = _webm.encode_webm_frames(
        [_jpeg.encode_jpeg_gray(8, 8, bytes(64))] * 2, [0, 10]
    )
    m = bytearray(valid)
    m[4] = 0x00  # first vint byte inside the EBML header body
    out = _assert_terminates(_webm.webm_demux, bytes(m), "webm vint=0x00")
    assert "exc" in out
    # truncate INSIDE the unknown-size Segment: the walk must stop at
    # the enclosure end it computed, then fail on the missing cluster
    out = _assert_terminates(
        _webm.webm_demux, valid[: len(valid) // 2], "webm truncated segment"
    )
    assert "exc" in out


def test_stall_mutant_ogg_zero_segment_page_run():
    """An Ogg page with nseg=0 advances exactly 27 bytes; a long run of
    them must walk linearly (CRC-correct empty pages), then fail on
    the empty packet stream rather than hang."""
    pages = bytearray()
    for seq in range(2048):
        page = bytearray(
            b"OggS" + bytes([0, 0]) + struct.pack("<q", 0)
            + struct.pack("<I", 7) + struct.pack("<I", seq)
            + b"\x00\x00\x00\x00" + bytes([0])
        )
        crc = _ogg.ogg_crc(bytes(page))
        page[22:26] = struct.pack("<I", crc)
        pages += page
    out = _assert_terminates(
        _ogg.ogg_demux, bytes(pages), "ogg 2048 empty pages"
    )
    assert isinstance(out.get("exc"), NotImplementedError)  # empty stream


def test_stall_mutant_wav_zero_size_chunk_run():
    """RIFF chunks with size=0 advance 8 bytes each — a run of them
    must walk linearly and then fail on the missing fmt/data chunks."""
    payload = b"RIFF" + struct.pack("<I", 36) + b"WAVE" + b"JUNK\x00\x00\x00\x00" * 1024
    out = _assert_terminates(_mm.decode_audio, payload, "wav 1024 empty chunks")
    assert isinstance(out.get("exc"), NotImplementedError)


def test_stall_mutant_adpcm_zero_block_align():
    """block_align=0 would make _decode_ima_adpcm's position advance by
    zero per block — the fmt-chunk guard must reject it before the
    loop is reached."""
    valid = bytearray(_mm.encode_wav_ima_adpcm([0] * 64))
    at = bytes(valid).find(b"fmt ")
    assert at > 0
    # fmt body starts at at+8; block_align is bytes 12..14 of the body
    valid[at + 8 + 12 : at + 8 + 14] = b"\x00\x00"
    out = _assert_terminates(_mm.decode_audio, bytes(valid), "adpcm align=0")
    assert isinstance(out.get("exc"), NotImplementedError)


def test_stall_mutant_zip_entry_count_overclaim():
    """The central-directory walk is bounded by the EOCD entry count; a
    count far past the real directory must fail on the signature
    check, never scan-spin."""
    enc = _zip.encode_zip([("a.bin", b"data", True)])
    eocd = enc.rfind(b"PK\x05\x06")
    m = bytearray(enc)
    m[eocd + 8 : eocd + 12] = struct.pack("<HH", 0x7FFF, 0x7FFF)
    out = _assert_terminates(_zip.zip_members, bytes(m), "zip n_total=32767")
    assert isinstance(out.get("exc"), NotImplementedError)


def test_stall_mutant_netpbm_unterminated_comment_and_negative_dims():
    """A '#' comment with no trailing newline used to raise a raw
    ValueError from bytes.index; negative header tokens built negative
    raster sizes. Both must be the declared contract (r11)."""
    out = _assert_terminates(
        _mm.decode_image, b"P6# no newline ever", "ppm unterminated comment"
    )
    assert isinstance(out.get("exc"), NotImplementedError)
    out = _assert_terminates(
        _mm.decode_image, b"P6\n-2 3\n255\n" + bytes(18), "ppm negative width"
    )
    assert isinstance(out.get("exc"), NotImplementedError)
    out = _assert_terminates(
        _mm.decode_image, b"P6\n2 x3\n255\n" + bytes(18), "ppm garbage token"
    )
    assert isinstance(out.get("exc"), NotImplementedError)


def test_stall_mutant_flac_zero_length_metadata_run():
    """FLAC metadata blocks with length 0 advance 4 bytes each — a long
    non-last run must walk linearly, then fail on the missing
    STREAMINFO, not hang."""
    payload = b"fLaC" + b"\x02\x00\x00\x00" * 4096  # never sets the last bit
    out = _assert_terminates(_flac.decode_flac, payload, "flac 4096 empty blocks")
    assert isinstance(out.get("exc"), NotImplementedError)
