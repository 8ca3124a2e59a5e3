"""Pure-Python container-header decoders (multimodal.decode_media)."""

import struct

from ukeeper_readability_spark.pipeline.multimodal import _ZERO_META, decode_media


def _full(container, **kw):
    return dict(_ZERO_META, container=container, **kw)


def _png(w, h):
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + struct.pack(">II", w, h)
        + b"\x08\x06\x00\x00\x00" + b"\x00" * 4
    )


def _gif(w, h, frames, gct=False, ext=True):
    flags = 0x80 | 0x02 if gct else 0
    out = b"GIF89a" + struct.pack("<HH", w, h) + bytes([flags, 0, 0])
    if gct:
        out += b"\x00" * (3 * (2 << (flags & 7)))
    if ext:  # graphic control extension before first frame
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    for _ in range(frames):
        out += b"\x2c" + b"\x00" * 4 + struct.pack("<HH", w, h) + b"\x00"
        out += b"\x02" + b"\x01\xaa" + b"\x00"
    return out + b"\x3b"


def _wav(n_samples, block_align=2):
    data = b"\x00" * (n_samples * block_align)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000 * block_align, block_align, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_png_ihdr():
    m = decode_media(_png(640, 480))
    assert m == _full("png", width=640, height=480, n_frames=1)


def test_gif_block_walk():
    m = decode_media(_gif(320, 200, 5))
    assert m == _full("gif", width=320, height=200, n_frames=5)
    # with a global color table and extensions the walk still lands on frames
    m2 = decode_media(_gif(16, 16, 3, gct=True, ext=True))
    assert (m2["n_frames"], m2["width"]) == (3, 16)


def test_wav_chunk_walk():
    m = decode_media(_wav(1000, block_align=2))
    assert m == _full("wav", n_frames=1000, duration_ms=125, n_tracks=1)


def _jpeg(w, h, com=b""):
    out = b"\xff\xd8"
    out += b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    if com:
        out += b"\xff\xfe" + struct.pack(">H", 2 + len(com)) + com
    out += b"\xff\xc0\x00\x11\x08" + struct.pack(">HH", h, w)
    out += b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    return out + b"\xff\xd9"


def test_jpeg_sof_walk():
    m = decode_media(_jpeg(640, 480))
    assert m == _full("jpeg", width=640, height=480, n_frames=1)
    # COM segment before SOF exercises the variable-length skip
    m = decode_media(_jpeg(12, 34, com=b"x" * 37))
    assert (m["width"], m["height"]) == (12, 34)
    # progressive SOF2 is a frame header too
    prog = _jpeg(5, 6).replace(b"\xff\xc0", b"\xff\xc2")
    assert decode_media(prog)["width"] == 5
    # restart markers (standalone, no length) are skipped
    rst = b"\xff\xd8\xff\xd0" + _jpeg(7, 8)[2:]
    assert decode_media(rst)["width"] == 7


def test_unknown_and_corrupt_payloads():
    assert decode_media(b"")["container"] == "unknown"
    # JPEG magic with a lying APP0 length running past EOF: still a jpeg
    # container, zeroed dimensions, no crash
    m = decode_media(b"\xff\xd8\xff\xe0 not handled")
    assert m == _full("jpeg")
    # SOS before any SOF: zeroed dims
    assert decode_media(b"\xff\xd8\xff\xda\x00\x02")["width"] == 0
    # truncated PNG signature-only must not crash
    assert decode_media(b"\x89PNG\r\n\x1a\n\x00\x00")["container"] == "unknown"
    # GIF with a lying sub-block size running past EOF
    bad = b"GIF89a" + struct.pack("<HH", 4, 4) + b"\x00\x00\x00" + b"\x2c" + b"\x00" * 9 + b"\x02\xff"
    m = decode_media(bad)
    assert m["container"] == "gif" and m["n_frames"] == 1

# ---------------------------------------------------------------------------
# MP4 / ISO-BMFF (VERDICT r4 item 4)
# ---------------------------------------------------------------------------


def _box(typ, payload):
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _mvhd(timescale, duration, version=0):
    if version:
        body = (b"\x01\x00\x00\x00" + b"\x00" * 16
                + struct.pack(">IQ", timescale, duration))
    else:
        body = (b"\x00" * 4 + b"\x00" * 8
                + struct.pack(">II", timescale, duration))
    # rate, volume+reserved, reserved, matrix, pre_defined, next_track_id
    body += b"\x00\x01\x00\x00" + b"\x01\x00\x00\x00" + b"\x00" * 8
    body += (b"\x00\x01\x00\x00" + b"\x00" * 12) * 2 + b"\x40\x00\x00\x00"
    body += b"\x00" * 24 + struct.pack(">I", 2)
    return _box(b"mvhd", body)


def _tkhd(track_id, w, h):
    body = (b"\x00\x00\x00\x07" + b"\x00" * 8 + struct.pack(">I", track_id)
            + b"\x00" * 4 + struct.pack(">I", 1000) + b"\x00" * 8
            + b"\x00" * 8)
    body += (b"\x00\x01\x00\x00" + b"\x00" * 12) * 2 + b"\x40\x00\x00\x00"
    body += struct.pack(">II", w << 16, h << 16)
    return _box(b"tkhd", body)


def _mp4(w=320, h=240, tracks=1, timescale=1000, duration=2500, version=0):
    ftyp = _box(b"ftyp", b"isom" + b"\x00\x00\x02\x00")
    moov = _box(b"moov", _mvhd(timescale, duration, version)
                + b"".join(_box(b"trak", _tkhd(i + 1, w, h))
                           for i in range(tracks)))
    return ftyp + moov + _box(b"mdat", b"\x00" * 16)


def test_mp4_box_walk():
    m = decode_media(_mp4(w=320, h=240, tracks=2, duration=2500))
    assert m == _full("mp4", width=320, height=240, duration_ms=2500,
                      n_tracks=2)
    # version-1 mvhd carries 64-bit duration
    m = decode_media(_mp4(duration=90000, timescale=600, version=1))
    assert (m["duration_ms"], m["n_tracks"]) == (150000, 1)
    # timescale in non-ms units
    m = decode_media(_mp4(duration=1200, timescale=600))
    assert m["duration_ms"] == 2000


def test_mp4_largesize_and_eof_boxes():
    ftyp = _box(b"ftyp", b"isom" + b"\x00\x00\x02\x00")
    inner = _mvhd(1000, 750) + _box(b"trak", _tkhd(1, 64, 32))
    # moov written with size==1 + 64-bit largesize
    moov = (struct.pack(">I", 1) + b"moov"
            + struct.pack(">Q", 16 + len(inner)) + inner)
    # trailing mdat with size==0 (extends to EOF)
    tail = struct.pack(">I", 0) + b"mdat" + b"\x00" * 5
    m = decode_media(ftyp + moov + tail)
    assert m == _full("mp4", width=64, height=32, duration_ms=750, n_tracks=1)


def test_mp4_corrupt_never_raises():
    # ftyp magic alone: an mp4 container with zeroed features
    assert decode_media(_box(b"ftyp", b"isom")) == _full("mp4")
    # lying box size running past EOF stops the walk, keeps prior finds
    good = _mp4(tracks=1)
    assert decode_media(good[:40])["container"] == "mp4"
    truncated = good[: len(good) - 10]
    assert decode_media(truncated)["n_tracks"] == 1
    # a size smaller than its own header stops cleanly
    bad = _box(b"ftyp", b"isom") + struct.pack(">I", 3) + b"moov"
    assert decode_media(bad) == _full("mp4")
