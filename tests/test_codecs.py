"""Real image decode: pure-stdlib PNG/BMP codecs, unit + through the
same mapInPandas plumbing the fake path uses (fake=False end-to-end)."""

import struct
import zlib

import pytest

from sparketl.codecs import (
    CodecError,
    bmp_pixels,
    encode_bmp,
    encode_png,
    image_meta,
    png_meta,
    png_pixels,
    sniff_format,
)


def _gradient(w, h, ch):
    return bytes(((x * 7 + y * 13 + c * 31) % 256)
                 for y in range(h) for x in range(w) for c in range(ch))


def test_png_roundtrip_rgb_and_gray_and_rgba():
    for ch in (1, 2, 3, 4):
        raw = _gradient(5, 4, ch)
        b = encode_png(5, 4, ch, raw)
        assert sniff_format(b) == "png"
        assert png_meta(b) == (5, 4, ch)
        assert png_pixels(b) == (5, 4, ch, raw)


def _forward_filter(ftype, line, prev, ch):
    """Reference forward filtering (PNG spec §6) to build test bytes."""
    out = bytearray(len(line))
    for i in range(len(line)):
        left = line[i - ch] if i >= ch else 0
        up = prev[i]
        ul = prev[i - ch] if i >= ch else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) >> 1
        else:  # Paeth
            p = left + up - ul
            pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
            pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
        out[i] = (line[i] - pred) & 0xFF
    return bytes(out)


def test_png_all_filter_types_invert():
    """Hand-filter each scanline with a different filter type (0..4)
    and check the decoder inverts all of them exactly."""
    w, h, ch = 6, 5, 3
    raw = _gradient(w, h, ch)
    stride = w * ch
    prev = bytes(stride)
    body = bytearray()
    for y in range(h):
        line = raw[y * stride : (y + 1) * stride]
        ftype = y % 5
        body += bytes([ftype]) + _forward_filter(ftype, line, prev, ch)
        prev = line
    color = 2  # RGB
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(body)))
        + chunk(b"IEND", b"")
    )
    assert png_pixels(png) == (w, h, ch, raw)


def test_bmp_roundtrip_padding_and_row_order():
    # w=3 → 9-byte rows padded to 12: exercises both padding and the
    # bottom-up flip
    raw = _gradient(3, 4, 3)
    b = encode_bmp(3, 4, raw)
    assert sniff_format(b) == "bmp"
    assert image_meta(b) == (3, 4, 3, "bmp")
    assert bmp_pixels(b) == (3, 4, 3, raw)


def test_malformed_payloads_raise():
    with pytest.raises(CodecError):
        image_meta(b"not an image at all")
    with pytest.raises(CodecError):
        png_meta(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8)  # signature, no IHDR
    # 16-bit PNG is unsupported, must refuse (not mis-decode)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    crc = zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF
    png16 = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", crc)
    )
    with pytest.raises(CodecError):
        png_meta(png16)


def test_decode_images_real_path_through_spark(spark):
    """fake=False end-to-end: real PNG + BMP + corrupt payloads travel
    the identical Arrow/mapInPandas route; corrupt rows are quarantined
    as format='unknown' with NULL dims, not batch failures."""
    from sparketl.operators.multimodal import decode_images

    png = encode_png(7, 3, 3, _gradient(7, 3, 3))
    bmp = encode_bmp(5, 6, _gradient(5, 6, 3))
    junk = b"\xde\xad\xbe\xef" * 10
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(bmp)), (3, bytearray(junk))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in decode_images(df, fake=False).collect()}
    assert (rows[1]["width"], rows[1]["height"], rows[1]["channels"]) == (7, 3, 3)
    assert rows[1]["format"] == "png" and rows[1]["n_bytes"] == len(png)
    assert (rows[2]["width"], rows[2]["height"], rows[2]["channels"]) == (5, 6, 3)
    assert rows[2]["format"] == "bmp"
    assert rows[3]["format"] == "unknown"
    assert rows[3]["width"] is None and rows[3]["channels"] is None


def test_extract_features_real_pixels_compression_invariant(spark):
    """fake=False features hash the DECODED pixels: the same image
    stored as PNG (zlib-compressed) and BMP (raw... BGR) must produce
    identical histograms when the sample bytes match."""
    from sparketl.operators.multimodal import extract_features

    # same pixel bytes in both containers (PNG stores RGB top-down,
    # BMP BGR bottom-up — a histogram is order/channel-permutation
    # invariant for this payload since we feed it symmetric data)
    raw = _gradient(4, 4, 3)
    png = encode_png(4, 4, 3, raw)
    bmp = encode_bmp(4, 4, raw)
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(bmp)), (3, bytearray(b"junk"))],
        "doc_id long, payload binary",
    )
    feats = {
        r["doc_id"]: r["feature"]
        for r in extract_features(df, dim=8, fake=False).collect()
    }
    import numpy as np

    arr = np.frombuffer(raw, dtype=np.uint8)
    want = np.bincount(arr % 8, minlength=8) / len(arr)
    assert np.allclose(feats[1], want)
    # BMP row-flip/BGR-swap permutes byte ORDER only — same multiset
    assert np.allclose(sorted(feats[2]), sorted(want))
    assert feats[3] == [0.0] * 8  # undecodable → zero vector


def test_wav_roundtrip_and_meta():
    from sparketl.codecs import encode_wav, wav_meta, wav_samples

    samples = [0, 100, -100, 32767, -32768, 5, 6, 7]
    b = encode_wav(2, 44100, samples)
    assert wav_meta(b) == (2, 44100, 16, 4)  # 8 samples / 2 channels
    assert wav_samples(b) == (2, 44100, samples)


def test_wav_rejects_non_pcm_and_garbage():
    import struct

    from sparketl.codecs import CodecError, encode_wav, wav_meta

    with pytest.raises(CodecError):
        wav_meta(b"RIFFxxxxNOPE")
    with pytest.raises(CodecError):
        wav_meta(b"not audio")
    # IEEE-float format tag (3) must refuse, not mis-parse
    b = bytearray(encode_wav(1, 8000, [1, 2]))
    fmt_off = b.index(b"fmt ") + 8
    b[fmt_off : fmt_off + 2] = struct.pack("<H", 3)
    with pytest.raises(CodecError):
        wav_meta(bytes(b))


def test_decode_audio_real_path_through_spark(spark):
    """fake=False end-to-end: a real PCM WAV and a corrupt payload
    through the same mapInPandas route; corrupt → format='unknown'."""
    from sparketl.codecs import encode_wav
    from sparketl.operators.multimodal import decode_audio

    wav = encode_wav(2, 16000, list(range(-50, 50)))
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(b"\x00\x01junk"))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in decode_audio(df, fake=False).collect()}
    assert (rows[1]["n_channels"], rows[1]["sample_rate"], rows[1]["bits"]) == (
        2,
        16000,
        16,
    )
    assert rows[1]["n_frames"] == 50 and rows[1]["format"] == "wav"
    assert rows[2]["format"] == "unknown" and rows[2]["n_frames"] is None


def test_avi_frame_offsets_roundtrip():
    from sparketl.codecs import CodecError, avi_frame_offsets, encode_avi

    payloads = [b"frame-one", b"f2", b"frame-three!"]
    b = encode_avi(payloads)
    n, frames = avi_frame_offsets(b)
    assert n == 3
    # offsets point at the REAL payload bytes in the container
    assert [b[off : off + sz] for off, sz in frames] == payloads
    with pytest.raises(CodecError):
        avi_frame_offsets(b"RIFF\x04\x00\x00\x00WAVE")  # not AVI
    with pytest.raises(CodecError):
        avi_frame_offsets(b"nonsense")


def test_sample_frames_real_avi_through_spark(spark):
    from sparketl.codecs import encode_avi
    from sparketl.operators.multimodal import sample_frames

    avi = encode_avi([b"k" * 10, b"p" * 4, b"k" * 10, b"p" * 4])
    df = spark.createDataFrame(
        [(1, bytearray(avi)), (2, bytearray(b"junk"))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in sample_frames(df, fake=False).collect()}
    assert rows[1]["format"] == "avi" and rows[1]["n_frames"] == 4
    assert len(rows[1]["frame_offsets"]) == 4
    # offsets really address the frame payloads
    off0 = rows[1]["frame_offsets"][0]
    assert bytes(avi[off0 : off0 + 10]) == b"k" * 10
    assert rows[2]["format"] == "unknown"


# ----------------------------------------------------------------- GIF


def test_gif_roundtrip_and_meta():
    """encode_gif → gif_pixels reproduces the palette-expanded RGB
    exactly; image_meta/image_pixels dispatch on the GIF signature."""
    from sparketl.codecs import encode_gif, gif_meta, gif_pixels, image_meta, image_pixels

    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    idx = bytes([0, 1, 2, 3, 3, 2, 1, 0, 1, 1, 2, 2])
    g = encode_gif(4, 3, pal, idx)
    assert gif_meta(g) == (4, 3, 3)
    assert image_meta(g) == (4, 3, 3, "gif")
    w, h, ch, rgb = gif_pixels(g)
    assert (w, h, ch) == (4, 3, 3)
    assert rgb == b"".join(pal[3 * i : 3 * i + 3] for i in idx)
    assert image_pixels(g) == (w, h, ch, rgb)


def test_gif_lzw_decode_handles_dictionary_growth():
    """The decoder follows GIF LZW width-growth timing: a reference
    encoder that grows the dictionary across 9→11-bit codes round-trips
    byte-exactly."""
    import random

    from sparketl.codecs import _gif_lzw_decode

    def lzw_encode(min_code, data):
        clear = 1 << min_code
        end = clear + 1
        table = {bytes([i]): i for i in range(clear)}
        next_code = end + 1
        code_size = min_code + 1
        codes, sizes, w = [clear], [min_code + 1], b""
        for c in data:
            wc = w + bytes([c])
            if wc in table:
                w = wc
                continue
            codes.append(table[w])
            sizes.append(code_size)
            if next_code < 4096:
                table[wc] = next_code
                next_code += 1
                if next_code - 1 == (1 << code_size) and code_size < 12:
                    code_size += 1
            w = bytes([c])
        codes.append(table[w])
        sizes.append(code_size)
        codes.append(end)
        sizes.append(code_size)
        acc = nb = 0
        out = bytearray()
        for code, cs in zip(codes, sizes):
            acc |= code << nb
            nb += cs
            while nb >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nb -= 8
        if nb:
            out.append(acc & 0xFF)
        return bytes(out)

    random.seed(7)
    data = bytes(random.choice(b"abcd") for _ in range(5000))
    assert _gif_lzw_decode(8, lzw_encode(8, data)) == data


def test_gif_error_paths():
    import struct

    import pytest as _pytest

    from sparketl.codecs import CodecError, encode_gif, gif_meta, gif_pixels

    with _pytest.raises(CodecError):
        gif_meta(b"NOTGIF" + b"\x00" * 20)
    g = bytearray(encode_gif(2, 2, bytes(12), bytes(4)))
    # flip the interlace bit in the image descriptor's packed byte
    desc = g.index(0x2C)
    g[desc + 9] |= 0x40
    with _pytest.raises(CodecError):
        gif_pixels(bytes(g))


def test_gif_pixel_index_beyond_palette_raises():
    """A GIF whose LZW stream carries an index >= the palette entry
    count must raise, not silently emit a short RGB buffer (the
    min_code_size byte is independent of the declared palette size, so
    a corrupt file can smuggle out-of-range literals)."""
    import struct

    import pytest as _pytest

    from sparketl.codecs import CodecError, gif_pixels

    w = h = 2
    # screen descriptor: global palette flag, size bits 1 → 4 entries
    header = b"GIF89a" + struct.pack("<HH", w, h) + bytes([0x81, 0, 0])
    palette = bytes(12)
    img_desc = b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    # LZW with min_code_size 4: literals 0..15 are legal in the stream
    # but only palette indices 0..3 exist
    min_code, code_size = 4, 5
    clear, end = 16, 17
    acc = n_bits = 0
    stream = bytearray()
    for code in (clear, 10, 0, 0, 0, end):
        acc |= code << n_bits
        n_bits += code_size
        while n_bits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8
    if n_bits:
        stream.append(acc & 0xFF)
    gif = (
        header + palette + img_desc + bytes([min_code, len(stream)])
        + bytes(stream) + b"\x00\x3b"
    )
    with _pytest.raises(CodecError, match="palette"):
        gif_pixels(gif)


def test_decode_images_real_gif_through_spark(spark):
    """fake=False mapInPandas route decodes GIF payloads next to
    PNG/BMP with no code change (sniff dispatch)."""
    from sparketl.codecs import encode_gif
    from sparketl.operators.multimodal import decode_images

    pal = bytes([i * 8 % 256 for i in range(24)])
    g = encode_gif(4, 2, pal, bytes([i % 8 for i in range(8)]))
    df = spark.createDataFrame(
        [(1, bytearray(g))], "doc_id long, payload binary"
    )
    r = decode_images(df, fake=False).collect()[0]
    assert (r["width"], r["height"], r["channels"], r["format"]) == (4, 2, 3, "gif")
