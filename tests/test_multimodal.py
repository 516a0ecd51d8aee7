"""Pure-Python image header parsing (public PNG/T.81 specs): correct
dims on valid containers, None (never an exception) on everything else."""

import pytest

from xqspark.multimodal import PNG_SIG, parse_image_meta, pixel_decode_stub


def png(w, h):
    return (
        PNG_SIG
        + (13).to_bytes(4, "big")
        + b"IHDR"
        + w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + b"\x08\x06\x00\x00\x00"
        + b"\xde\xad\xbe\xef"
    )


def jpeg(w, h, extra_segments=0):
    out = b"\xff\xd8"
    for _ in range(extra_segments):  # APPn/comment segments before SOF
        out += b"\xff\xe1" + (8).to_bytes(2, "big") + b"abcdef"
    out += (
        b"\xff\xc0"
        + (17).to_bytes(2, "big")
        + b"\x08"
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    return out + b"\xff\xd9"


def test_png_dims():
    assert parse_image_meta(png(640, 480)) == ("png", 640, 480)
    assert parse_image_meta(png(1, 1)) == ("png", 1, 1)
    assert parse_image_meta(png(70000, 3)) == ("png", 70000, 3)  # >16 bits


def test_jpeg_dims_walks_segments():
    assert parse_image_meta(jpeg(800, 600)) == ("jpeg", 800, 600)
    assert parse_image_meta(jpeg(31, 17, extra_segments=3)) == ("jpeg", 31, 17)


def test_jpeg_progressive_sof2():
    blob = b"\xff\xd8\xff\xc2" + (17).to_bytes(2, "big") + b"\x08" + (
        9
    ).to_bytes(2, "big") + (7).to_bytes(2, "big") + b"\x03" + b"\x00" * 9
    assert parse_image_meta(blob) == ("jpeg", 7, 9)


def test_containment_never_raises():
    cases = [
        None,
        b"",
        b"plain text",
        PNG_SIG,                      # truncated after signature
        PNG_SIG + b"\x00\x00",        # truncated IHDR
        PNG_SIG + b"\x00\x00\x00\x0dIDAT" + b"\x00" * 12,  # wrong first chunk
        b"\xff\xd8",                  # bare SOI
        b"\xff\xd8\xff\xd9",          # SOI+EOI, no SOF
        b"\xff\xd8\xff\xe0\x00\x01",  # segment length < 2
        b"\xff\xd8\x00\x00",          # marker without FF
        jpeg(1, 1)[:-6],              # truncated mid-SOF -> still parses hdr
        b"\xff\xd8\xff\xc0\x00\x11\x08\x00",  # SOF truncated before dims
    ]
    for blob in cases:
        parse_image_meta(blob)  # must not raise


def test_dht_is_not_a_frame_header():
    # C4 (DHT) must be skipped, then the real SOF0 read
    blob = (
        b"\xff\xd8"
        + b"\xff\xc4" + (5).to_bytes(2, "big") + b"abc"
        + b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
        + (2).to_bytes(2, "big") + (3).to_bytes(2, "big") + b"\x00" * 10
    )
    assert parse_image_meta(blob) == ("jpeg", 3, 2)


def test_tem_marker_is_standalone():
    # TEM (0x01) carries no length word (T.81 B.1.1.3) — it must be
    # stepped over, not parsed as a length-prefixed segment
    blob = (
        b"\xff\xd8"
        + b"\xff\x01"  # TEM: if misread as a segment, 0xffc0 becomes its "length"
        + b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
        + (4).to_bytes(2, "big") + (6).to_bytes(2, "big") + b"\x00" * 10
    )
    assert parse_image_meta(blob) == ("jpeg", 6, 4)


def test_short_fmt_chunk_is_rejected():
    # a fmt chunk DECLARING size < 16 must not read the next chunk's bytes
    from xqspark.multimodal import parse_audio_meta

    good = wav(2, 44100, 100)
    short_fmt = (
        good[:12]
        + b"fmt " + (4).to_bytes(4, "little") + b"\x01\x00\x02\x00"  # truncated fmt
        + good[12:]  # a full fmt + data follows — the walk must resync on it
    )
    assert parse_audio_meta(short_fmt) == ("wav", 2, 44100, 100)
    # and with ONLY the short fmt present, the header is unusable -> None
    only_short = (
        good[:12]
        + b"fmt " + (4).to_bytes(4, "little") + b"\x01\x00\x02\x00"
        + b"data" + (8).to_bytes(4, "little") + b"\x00" * 8
    )
    assert parse_audio_meta(only_short) is None


def test_pixel_decode_is_a_declared_stub():
    with pytest.raises(NotImplementedError):
        pixel_decode_stub(b"\x00")


def wav(channels=2, rate=44100, frames=100, bits=16):
    block = channels * bits // 8
    data_size = frames * block
    return (
        b"RIFF" + (36 + data_size).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little") + (rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little") + bits.to_bytes(2, "little")
        + b"data" + data_size.to_bytes(4, "little") + b"\x00" * data_size
    )


def test_wav_metadata():
    from xqspark.multimodal import parse_audio_meta

    assert parse_audio_meta(wav(2, 44100, 100)) == ("wav", 2, 44100, 100)
    assert parse_audio_meta(wav(1, 8000, 7)) == ("wav", 1, 8000, 7)
    # extra chunk before fmt (LIST) is skipped via word-aligned walking
    extra = (b"RIFF" + (200).to_bytes(4, "little") + b"WAVE"
             + b"LIST" + (5).to_bytes(4, "little") + b"abcde\x00"  # odd -> padded
             + wav(2, 22050, 3)[12:])
    assert parse_audio_meta(extra) == ("wav", 2, 22050, 3)


def test_wav_containment():
    from xqspark.multimodal import parse_audio_meta

    for blob in [None, b"", b"RIFF", b"RIFFxxxxWAVE", b"plain text",
                 wav()[:20], b"RIFF" + b"\x00" * 8,
                 b"RIFF\xff\xff\xff\xffWAVEfmt \xff\xff\xff\xff"]:
        parse_audio_meta(blob)  # must not raise


def mp4(timescale=1000, duration=500, version=0):
    mvhd_body = bytes([version, 0, 0, 0])
    if version == 0:
        mvhd_body += (0).to_bytes(4, "big") * 2
        mvhd_body += timescale.to_bytes(4, "big") + duration.to_bytes(4, "big")
        mvhd_body += b"\x00" * 80
    else:
        mvhd_body += (0).to_bytes(8, "big") * 2
        mvhd_body += timescale.to_bytes(4, "big") + duration.to_bytes(8, "big")
        mvhd_body += b"\x00" * 80
    mvhd = (8 + len(mvhd_body)).to_bytes(4, "big") + b"mvhd" + mvhd_body
    moov = (8 + len(mvhd)).to_bytes(4, "big") + b"moov" + mvhd
    ftyp = (16).to_bytes(4, "big") + b"ftypisom" + (0x200).to_bytes(4, "big")
    return ftyp + moov


def test_mp4_metadata():
    from xqspark.multimodal import parse_video_meta

    assert parse_video_meta(mp4(1000, 500)) == ("mp4", 1000, 500)
    assert parse_video_meta(mp4(90000, 123456, version=1)) == ("mp4", 90000, 123456)
    # a free box before moov is skipped
    blob = mp4()
    free = (12).to_bytes(4, "big") + b"free" + b"\x00" * 4
    assert parse_video_meta(blob[:16] + free + blob[16:]) == ("mp4", 1000, 500)


def test_mp4_containment():
    from xqspark.multimodal import parse_video_meta

    for blob in [None, b"", b"not a video", mp4()[:10], mp4()[:30],
                 b"\x00\x00\x00\x10ftypisom" + b"\x00" * 4,  # no moov
                 b"\x00\x00\x00\x00ftyp" + b"\x00" * 20]:    # size 0 bail
        parse_video_meta(blob)  # must not raise


def pdf(text="hello world", flate=False, n_extra_pages=0):
    import zlib

    content = f"BT /F1 12 Tf ({text}) Tj ET".encode("latin-1")
    filt = b""
    if flate:
        content = zlib.compress(content)
        filt = b"/Filter /FlateDecode "
    pages = b"".join(
        b"%d 0 obj << /Type /Page /Parent 2 0 R >> endobj\n" % (10 + i)
        for i in range(n_extra_pages)
    )
    return (
        b"%PDF-1.7\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        + pages
        + b"4 0 obj << " + filt + b"/Length %d >> stream\n" % len(content)
        + content
        + b"\nendstream endobj\n%%EOF"
    )


def test_pdf_meta():
    from xqspark.multimodal import parse_pdf_meta

    assert parse_pdf_meta(pdf()) == ("pdf", "1.7", 1)
    assert parse_pdf_meta(pdf(n_extra_pages=3)) == ("pdf", "1.7", 4)
    # /Type /Pages (the tree node) must NOT count as a page
    assert parse_pdf_meta(b"%PDF-1.4\n<< /Type /Pages >>") == ("pdf", "1.4", 0)
    assert parse_pdf_meta(b"not a pdf") is None
    assert parse_pdf_meta(None) is None


def test_pdf_text_plain_and_flate():
    from xqspark.multimodal import extract_pdf_text

    assert extract_pdf_text(pdf("alpha beta")) == "alpha beta"
    assert extract_pdf_text(pdf("deflated text", flate=True)) == "deflated text"


def test_pdf_string_escapes_and_tj_array():
    from xqspark.multimodal import extract_pdf_text

    # escaped parens/backslash, octal, and a TJ array with kerning numbers
    content = (
        rb"BT (paren \( close \) back\\slash \101) Tj "
        rb"[(ker) -120 (ned)] TJ (quote ') ' ET"
    )
    blob = (
        b"%PDF-1.4\n3 0 obj << /Type /Page >> endobj\n"
        + b"4 0 obj << /Length %d >> stream\n" % len(content)
        + content + b"\nendstream\n%%EOF"
    )
    got = extract_pdf_text(blob)
    assert got == "paren ( close ) back\\slash A ker ned quote '"


def test_pdf_containment():
    from xqspark.multimodal import extract_pdf_text, parse_pdf_meta

    cases = [
        None, b"", b"%PDF-", b"%PDF-1.4", pdf()[:40],           # truncated
        pdf()[: len(pdf()) - 20],                               # no endstream
        b"%PDF-1.4\nstream\n\xff\xfebroken",                     # garbage stream
        b"%PDF-1.4\n<< /Filter /FlateDecode >> stream\nnotzlib\nendstream",
    ]
    for blob in cases:
        parse_pdf_meta(blob)
        assert isinstance(extract_pdf_text(blob), str)  # never raises


def test_resize_and_features_real_numpy_path():
    """The non-fake stages of the pixel pipeline: nearest-neighbor
    resize picks arr[r*H//oh, c*W//ow] (identity when dims match,
    corner-correct when downscaling) and features are exact
    mean/population-std floored at 4dp."""
    import numpy as np

    from xqspark.multimodal import (
        _floor4,
        fake_decode_luma,
        frame_sample_offsets,
        luma_features,
        resize_nearest,
    )

    a = np.arange(64, dtype=np.uint8).reshape(8, 8)
    assert (resize_nearest(a, 8, 8) == a).all()  # identity
    half = resize_nearest(a, 4, 4)
    assert half[0, 0] == a[0, 0] and half[3, 3] == a[6, 6]

    const = np.full((5, 7), 9, dtype=np.uint8)
    m, sd = luma_features(const)
    assert m == 9.0 and sd == 0.0

    # the .00005-boundary case round() would split on: sum=2 over 64
    assert _floor4(2 / 64) == 0.0312

    # fake decode is deterministic and shaped (h, w)
    g1 = fake_decode_luma(b"abc", 20, 10)
    g2 = fake_decode_luma(b"abc", 20, 10)
    assert g1.shape == (10, 20) and (g1 == g2).all()
    assert fake_decode_luma(b"abd", 20, 10).tolist() != g1.tolist()

    assert frame_sample_offsets(1000, 4) == [125, 375, 625, 875]
    assert frame_sample_offsets(7, 4) == [0, 2, 4, 6]
