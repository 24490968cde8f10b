"""Pure-stdlib media codecs for the multimodal decode path.

This container ships no media libraries, but three mainstream formats
are decodable with nothing beyond ``zlib`` + ``struct`` (all are
public specs: PNG RFC 2083 / ISO 15948, BMP is the Windows DIB
layout, WAV is the RIFF/WAVE layout):

- **PNG**: signature check, IHDR parse, full IDAT inflate and
  scanline un-filtering (all five filter types incl. Paeth) for 8-bit
  greyscale/RGB/RGBA — a REAL decode producing the raw pixel bytes.
- **BMP**: BITMAPFILEHEADER/BITMAPINFOHEADER parse and uncompressed
  24/32-bit pixel-array extraction (bottom-up row order, 4-byte row
  padding stripped).
- **WAV**: RIFF chunk walk, PCM fmt parse, full 8/16-bit interleaved
  sample extraction.

Video: AVI (RIFF again) gets a container walk exposing the true
'00dc'/'00db' frame-chunk offsets — what keyframe sampling needs.
Minimal encoders for every format are included so tests can build
real byte payloads without fixtures. These codecs run inside the same
``mapInPandas`` Arrow-batch slot as the fake path in
``sparketl.operators.multimodal`` — per-partition, never row-by-row
through the driver — so swapping in Pillow/libav on a real cluster
changes only the per-batch function body, not the Spark plumbing.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type → channels


class CodecError(ValueError):
    pass


def sniff_format(b: bytes) -> str | None:
    if b[:8] == PNG_SIG:
        return "png"
    if b[:2] == b"BM" and len(b) >= 26:
        return "bmp"
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    return None


# ---------------------------------------------------------------- PNG


def _png_chunks(b: bytes):
    pos = 8
    while pos + 8 <= len(b):
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        yield ctype, data
        pos += 12 + length  # length + type + data + CRC
        if ctype == b"IEND":
            return


def png_meta(b: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from IHDR; raises CodecError on
    malformed or unsupported (non-8-bit / interlaced) images."""
    if b[:8] != PNG_SIG:
        raise CodecError("not a PNG")
    for ctype, data in _png_chunks(b):
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
                raise CodecError(
                    f"unsupported PNG (depth={depth} color={color} "
                    f"interlace={interlace})"
                )
            return w, h, _PNG_CHANNELS[color]
    raise CodecError("PNG missing IHDR")


def _paeth(a: int, bb: int, c: int) -> int:
    p = a + bb - c
    pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return bb if pb <= pc else c


def png_pixels(b: bytes) -> tuple[int, int, int, bytes]:
    """Full decode: inflate IDAT and reverse per-scanline filtering.
    Returns (width, height, channels, raw) with ``raw`` the
    row-major interleaved 8-bit samples (len == w*h*channels)."""
    w, h, ch = png_meta(b)
    idat = b"".join(data for ctype, data in _png_chunks(b) if ctype == b"IDAT")
    raw = zlib.decompress(idat)
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise CodecError("PNG pixel payload length mismatch")
    out = bytearray(h * stride)
    prev = bytearray(stride)
    for y in range(h):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = bytearray(raw[row_start + 1 : row_start + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise CodecError(f"unknown PNG filter {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return w, h, ch, bytes(out)


def encode_png(w: int, h: int, ch: int, raw: bytes) -> bytes:
    """Minimal valid PNG (filter 0 rows, one IDAT); for tests."""
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    stride = w * ch
    body = b"".join(
        b"\x00" + raw[y * stride : (y + 1) * stride] for y in range(h)
    )
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(body))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------- BMP


def bmp_meta(b: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from the DIB header; uncompressed
    24/32-bit only."""
    if b[:2] != b"BM":
        raise CodecError("not a BMP")
    (hdr_size,) = struct.unpack_from("<I", b, 14)
    if hdr_size < 40:
        raise CodecError("BMP core header unsupported")
    w, h = struct.unpack_from("<ii", b, 18)
    (bpp,) = struct.unpack_from("<H", b, 28)
    (comp,) = struct.unpack_from("<I", b, 30)
    if comp != 0 or bpp not in (24, 32):
        raise CodecError(f"unsupported BMP (bpp={bpp} compression={comp})")
    return w, abs(h), bpp // 8


def bmp_pixels(b: bytes) -> tuple[int, int, int, bytes]:
    """Uncompressed BMP pixel array as row-major top-down interleaved
    BGR(A) bytes — rows are stored bottom-up with 4-byte padding,
    both undone here."""
    w, h, ch = bmp_meta(b)
    (data_off,) = struct.unpack_from("<I", b, 10)
    (raw_h,) = struct.unpack_from("<i", b, 22)
    row_raw = w * ch
    row_padded = (row_raw + 3) & ~3
    need = data_off + row_padded * h
    if len(b) < need:
        raise CodecError("BMP pixel array truncated")
    out = bytearray(h * row_raw)
    for y in range(h):
        src_y = (h - 1 - y) if raw_h > 0 else y  # bottom-up unless h<0
        start = data_off + src_y * row_padded
        out[y * row_raw : (y + 1) * row_raw] = b[start : start + row_raw]
    return w, h, ch, bytes(out)


def encode_bmp(w: int, h: int, raw_bgr: bytes) -> bytes:
    """Minimal 24-bit uncompressed BMP (bottom-up, padded rows); for
    tests. ``raw_bgr`` is top-down row-major BGR."""
    row_raw = w * 3
    pad = (-row_raw) % 4
    body = b"".join(
        raw_bgr[y * row_raw : (y + 1) * row_raw] + b"\x00" * pad
        for y in range(h - 1, -1, -1)
    )
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    return hdr + dib + body


def image_meta(b: bytes) -> tuple[int, int, int, str]:
    """Dispatch: (width, height, channels, format) for any supported
    payload; CodecError if the bytes are neither PNG nor BMP."""
    fmt = sniff_format(b)
    if fmt == "png":
        w, h, ch = png_meta(b)
    elif fmt == "bmp":
        w, h, ch = bmp_meta(b)
    elif fmt == "gif":
        w, h, ch = gif_meta(b)
    else:
        raise CodecError("unrecognized image payload")
    return w, h, ch, fmt


def image_pixels(b: bytes) -> tuple[int, int, int, bytes]:
    fmt = sniff_format(b)
    if fmt == "png":
        return png_pixels(b)
    if fmt == "bmp":
        return bmp_pixels(b)
    if fmt == "gif":
        return gif_pixels(b)
    raise CodecError("unrecognized image payload")


# ---------------------------------------------------------------- WAV


def wav_meta(b: bytes) -> tuple[int, int, int, int]:
    """(n_channels, sample_rate, bits_per_sample, n_frames) from a
    RIFF/WAVE header — integer PCM (format tag 1) only. Pure struct
    parsing of the public RIFF layout."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise CodecError("not a RIFF/WAVE file")
    pos, fmt, data_len = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", b, pos + 4)
        body = pos + 8
        if cid == b"fmt " and clen >= 16:
            tag, ch, rate = struct.unpack_from("<HHI", b, body)
            (bits,) = struct.unpack_from("<H", b, body + 14)
            if tag != 1:
                raise CodecError(f"unsupported WAV format tag {tag} (PCM only)")
            fmt = (ch, rate, bits)
        elif cid == b"data":
            data_len = min(clen, len(b) - body)
        pos = body + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data_len is None:
        raise CodecError("WAV missing fmt/data chunk")
    ch, rate, bits = fmt
    if bits not in (8, 16) or ch < 1:
        raise CodecError(f"unsupported WAV ({bits}-bit, {ch}ch)")
    n_frames = data_len // (ch * (bits // 8))
    return ch, rate, bits, n_frames


def wav_samples(b: bytes) -> tuple[int, int, list[int]]:
    """(n_channels, sample_rate, samples) — interleaved integer PCM
    samples (8-bit unsigned → centered to signed; 16-bit LE signed)."""
    ch, rate, bits, n_frames = wav_meta(b)
    pos = 12
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", b, pos + 4)
        body = pos + 8
        if cid == b"data":
            raw = b[body : body + clen]
            if bits == 8:
                samples = [x - 128 for x in raw[: n_frames * ch]]
            else:
                samples = list(
                    struct.unpack_from(f"<{n_frames * ch}h", raw)
                )
            return ch, rate, samples
        pos = body + clen + (clen & 1)
    raise CodecError("WAV data chunk vanished")  # unreachable after meta


def encode_wav(ch: int, rate: int, samples: list[int]) -> bytes:
    """Minimal 16-bit PCM WAV; for tests. ``samples`` interleaved."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    size = 4 + (8 + len(fmt)) + (8 + len(data))
    return (
        b"RIFF"
        + struct.pack("<I", size)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


# ---------------------------------------------------------------- AVI


def avi_frame_offsets(b: bytes) -> tuple[int, list[tuple[int, int]]]:
    """(n_frames, [(byte_offset, size), ...]) of the video frame chunks
    in an AVI container — keyframe sampling needs the container walk,
    not the codec: each '00dc'/'00db' chunk inside LIST('movi') is one
    frame's compressed payload, located by pure RIFF arithmetic.
    Returns offsets into the original buffer (payload start, not chunk
    header)."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise CodecError("not a RIFF/AVI file")
    frames: list[tuple[int, int]] = []

    def walk(pos: int, end: int, in_movi: bool) -> None:
        while pos + 8 <= end:
            cid = b[pos : pos + 4]
            (clen,) = struct.unpack_from("<I", b, pos + 4)
            body = pos + 8
            if cid == b"LIST" and body + 4 <= end:
                ltype = b[body : body + 4]
                walk(body + 4, min(body + clen, end), ltype == b"movi")
            elif in_movi and cid[2:4] in (b"dc", b"db"):
                frames.append((body, clen))
            pos = body + clen + (clen & 1)

    walk(12, len(b), False)
    if not frames:
        raise CodecError("AVI contains no video frame chunks")
    return len(frames), frames


def encode_avi(frame_payloads: list[bytes]) -> bytes:
    """Minimal AVI (hdrl with avih + one movi list of 00dc chunks); for
    tests."""

    def chunk(cid: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return cid + struct.pack("<I", len(data)) + data + pad

    avih = struct.pack("<14I", 33333, 0, 0, 0x10, len(frame_payloads),
                       0, 1, 0, 64, 48, 0, 0, 0, 0)
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
    movi_body = b"movi" + b"".join(chunk(b"00dc", p) for p in frame_payloads)
    movi = chunk(b"LIST", movi_body)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------- GIF


def gif_meta(b: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from the logical screen descriptor.
    Pure struct parsing of the public GIF87a/89a layout; channels is 3
    (palette RGB)."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise CodecError("not a GIF")
    if len(b) < 13:
        raise CodecError("truncated GIF header")
    w, h = struct.unpack("<HH", b[6:10])
    return w, h, 3


def _gif_lzw_decode(min_code_size: int, data: bytes) -> bytes:
    """GIF-variant LZW: variable code width starting at min+1 bits,
    CLEAR resets the dictionary, width grows to 12 bits max."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    acc = n_bits = 0
    for byte in data:
        acc |= byte << n_bits
        n_bits += 8
        while n_bits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            n_bits -= code_size
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                code_size = min_code_size + 1
                prev = None
                continue
            if code == end:
                return bytes(out)
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]
            else:
                raise CodecError("corrupt LZW stream")
            out += entry
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
                if len(table) == (1 << code_size) and code_size < 12:
                    code_size += 1
            prev = entry
    return bytes(out)


def gif_pixels(b: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, 3, rgb_bytes) of the FIRST image block,
    composed against the global/local palette. Interlaced images and
    images smaller than the logical screen raise CodecError (out of
    scope for the fixture paths); extension blocks are skipped."""
    w, h, _ = gif_meta(b)
    packed = b[10]
    pos = 13
    palette = b""
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = b[pos : pos + 3 * n]
        pos += 3 * n
    while pos < len(b):
        block = b[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(b) and b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise CodecError(f"unexpected GIF block 0x{block:02x}")
        left, top, iw, ih = struct.unpack("<HHHH", b[pos + 1 : pos + 9])
        ipacked = b[pos + 9]
        pos += 10
        if ipacked & 0x40:
            raise CodecError("interlaced GIF not supported")
        if (left, top, iw, ih) != (0, 0, w, h):
            raise CodecError("partial-frame GIF not supported")
        if ipacked & 0x80:  # local palette wins
            n = 2 << (ipacked & 0x07)
            palette = b[pos : pos + 3 * n]
            pos += 3 * n
        if not palette:
            raise CodecError("GIF image without a palette")
        min_code_size = b[pos]
        pos += 1
        data = bytearray()
        while pos < len(b) and b[pos] != 0:
            ln = b[pos]
            data += b[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        indices = _gif_lzw_decode(min_code_size, bytes(data))
        if len(indices) < w * h:
            raise CodecError("short GIF pixel data")
        n_pal = len(palette) // 3
        rgb = bytearray()
        for i in indices[: w * h]:
            if i >= n_pal:
                raise CodecError(
                    f"GIF pixel index {i} exceeds palette size {n_pal}"
                )
            rgb += palette[3 * i : 3 * i + 3]
        return w, h, 3, bytes(rgb)
    raise CodecError("GIF contains no image block")


def encode_gif(w: int, h: int, palette: bytes, indices: bytes) -> bytes:
    """Minimal valid GIF89a writer (test fixture generator): global
    palette (padded to a power of two), one full-frame image, LZW
    stream that emits CLEAR before every literal so the dictionary
    never grows (legal, if inefficient)."""
    n_entries = max(2, len(palette) // 3)
    bits = max(1, (n_entries - 1).bit_length())
    n_pad = 1 << bits
    pal = palette + b"\x00" * (3 * n_pad - len(palette))
    min_code = max(2, bits)
    clear = 1 << min_code
    end = clear + 1
    code_size = min_code + 1
    acc = n_bits = 0
    stream = bytearray()
    def emit(code: int) -> None:
        nonlocal acc, n_bits
        acc |= code << n_bits
        n_bits += code_size
        while n_bits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8
    for idx in indices:
        emit(clear)
        emit(idx)
    emit(end)
    if n_bits:
        stream.append(acc & 0xFF)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HH", w, h)
    out.append(0x80 | (bits - 1))  # GCT present, size 2^bits
    out += b"\x00\x00"
    out += pal
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out.append(min_code)
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
