"""Pure-Python container-header decoders (multimodal.decode_media)."""

import struct

from ukeeper_readability_spark.pipeline.multimodal import decode_media


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
    assert m == {"container": "png", "width": 640, "height": 480, "n_frames": 1}


def test_gif_block_walk():
    m = decode_media(_gif(320, 200, 5))
    assert m == {"container": "gif", "width": 320, "height": 200, "n_frames": 5}
    # with a global color table and extensions the walk still lands on frames
    m2 = decode_media(_gif(16, 16, 3, gct=True, ext=True))
    assert (m2["n_frames"], m2["width"]) == (3, 16)


def test_wav_chunk_walk():
    m = decode_media(_wav(1000, block_align=2))
    assert m == {"container": "wav", "width": 0, "height": 0, "n_frames": 1000}


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
    assert m == {"container": "jpeg", "width": 640, "height": 480, "n_frames": 1}
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
    assert m == {"container": "jpeg", "width": 0, "height": 0, "n_frames": 0}
    # SOS before any SOF: zeroed dims
    assert decode_media(b"\xff\xd8\xff\xda\x00\x02")["width"] == 0
    # truncated PNG signature-only must not crash
    assert decode_media(b"\x89PNG\r\n\x1a\n\x00\x00")["container"] == "unknown"
    # GIF with a lying sub-block size running past EOF
    bad = b"GIF89a" + struct.pack("<HH", 4, 4) + b"\x00\x00\x00" + b"\x2c" + b"\x00" * 9 + b"\x02\xff"
    m = decode_media(bad)
    assert m["container"] == "gif" and m["n_frames"] == 1
