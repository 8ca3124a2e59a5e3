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


def test_unknown_and_corrupt_payloads():
    assert decode_media(b"")["container"] == "unknown"
    assert decode_media(b"\xff\xd8\xff\xe0 not handled")["container"] == "unknown"
    # truncated PNG signature-only must not crash
    assert decode_media(b"\x89PNG\r\n\x1a\n\x00\x00")["container"] == "unknown"
    # GIF with a lying sub-block size running past EOF
    bad = b"GIF89a" + struct.pack("<HH", 4, 4) + b"\x00\x00\x00" + b"\x2c" + b"\x00" * 9 + b"\x02\xff"
    m = decode_media(bad)
    assert m["container"] == "gif" and m["n_frames"] == 1
