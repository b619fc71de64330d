"""Image I/O — PNG (stdlib zlib), PFM, and NPY. No external deps.

Supplies what the reference leaves as `todo!()` (src/core/imageio.rs:3-5,
src/core/film.rs:153-180): real image read/write.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

from ..core import spectrum


def write_png(path, image, gamma=True):
    """image: (H, W, 3) float array (linear radiance) or uint8."""
    img = np.asarray(image)
    if img.dtype != np.uint8:
        if gamma:
            img = np.asarray(spectrum.gamma_correct(img))
        img = np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
    h, w = img.shape[:2]
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(tag, data):
        c = tag + data
        return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c) & 0xFFFFFFFF)

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw, 6))
           + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)


def read_png(path):
    """Minimal PNG reader: 8-bit RGB/RGBA/gray, no interlace. Returns
    linear float32 (H, W, 3) (sRGB decoded)."""
    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a png"
    pos, idat, ihdr = 8, b"", None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    w, h, depth, color, _, _, interlace = ihdr
    assert depth == 8 and interlace == 0, "unsupported png variant"
    nch = {0: 1, 2: 3, 4: 2, 6: 4}[color]
    raw = zlib.decompress(idat)
    stride = w * nch
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    pos = 0
    for y in range(h):
        ft = raw[pos]; pos += 1
        line = np.frombuffer(raw[pos:pos + stride], np.uint8).astype(np.int32)
        pos += stride
        rec = np.zeros(stride, np.int32)
        pv = prev.astype(np.int32)
        if ft == 0:
            rec = line
        elif ft == 2:
            rec = (line + pv) & 0xFF
        else:
            for x in range(stride):
                a = rec[x - nch] if x >= nch else 0
                b = pv[x]
                c = pv[x - nch] if x >= nch else 0
                if ft == 1:
                    rec[x] = (line[x] + a) & 0xFF
                elif ft == 3:
                    rec[x] = (line[x] + ((a + b) >> 1)) & 0xFF
                elif ft == 4:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec[x] = (line[x] + pred) & 0xFF
        out[y] = rec.astype(np.uint8)
        prev = out[y]
    img = out.reshape(h, w, nch).astype(np.float32) / 255.0
    if nch == 1:
        img = np.repeat(img, 3, axis=-1)
    elif nch == 2:
        img = np.repeat(img[..., :1], 3, axis=-1)
    elif nch == 4:
        img = img[..., :3]
    return np.asarray(spectrum.inverse_gamma_correct(img), np.float32)


def write_pfm(path, image):
    """PFM: float32 HDR format (scanlines bottom-up, little-endian)."""
    img = np.asarray(image, np.float32)
    h, w = img.shape[:2]
    with open(path, "wb") as f:
        f.write(b"PF\n" if img.ndim == 3 else b"Pf\n")
        f.write(f"{w} {h}\n-1.0\n".encode())
        f.write(np.flipud(img).tobytes())


def read_pfm(path):
    with open(path, "rb") as f:
        header = f.readline().strip()
        dims = f.readline().split()
        w, h = int(dims[0]), int(dims[1])
        scale = float(f.readline())
        nch = 3 if header == b"PF" else 1
        data = np.frombuffer(f.read(), "<f4" if scale < 0 else ">f4")
    img = data.reshape(h, w, nch) if nch == 3 else data.reshape(h, w)
    return np.flipud(img).copy()


def write_npy(path, image):
    np.save(path, np.asarray(image, np.float32))


def write_image(path, image):
    """Dispatch by extension (.png/.pfm/.npy)."""
    p = str(path)
    if p.endswith(".png"):
        write_png(p, image)
    elif p.endswith(".exr"):
        write_exr(p, image)
    elif p.endswith(".pfm"):
        write_pfm(p, image)
    elif p.endswith(".npy"):
        write_npy(p, image)
    else:
        raise ValueError(f"unsupported image extension: {p}")


def read_image(path):
    p = str(path)
    if p.endswith(".png"):
        return read_png(p)
    if p.endswith(".exr"):
        return read_exr(p)
    if p.endswith(".pfm"):
        return read_pfm(p)
    if p.endswith(".npy"):
        return np.load(p).astype(np.float32)
    raise ValueError(f"unsupported image extension: {p}")


def write_exr(path, image):
    """Minimal OpenEXR 2.0 writer: uncompressed scanlines, float32 RGB
    (supplies the HDR output the reference leaves as todo!(),
    src/core/film.rs:153-180)."""
    img = np.asarray(image, np.float32)
    h, w = img.shape[:2]
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)

    def attr(name, typ, data):
        return name.encode() + b"\x00" + typ.encode() + b"\x00" \
            + struct.pack("<I", len(data)) + data

    def box2i(xmin, ymin, xmax, ymax):
        return struct.pack("<4i", xmin, ymin, xmax, ymax)

    chans = b""
    for c in (b"B", b"G", b"R"):
        chans += c + b"\x00" + struct.pack("<iiii", 2, 0, 1, 1)  # FLOAT, sampling 1,1
    chans += b"\x00"

    header = b""
    header += attr("channels", "chlist", chans)
    header += attr("compression", "compression", b"\x00")  # none
    header += attr("dataWindow", "box2i", box2i(0, 0, w - 1, h - 1))
    header += attr("displayWindow", "box2i", box2i(0, 0, w - 1, h - 1))
    header += attr("lineOrder", "lineOrder", b"\x00")
    header += attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += attr("screenWindowCenter", "v2f", struct.pack("<2f", 0.0, 0.0))
    header += attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\x00"

    magic = struct.pack("<I", 20000630) + struct.pack("<I", 2)
    offset_table_pos = len(magic) + len(header)
    data_start = offset_table_pos + 8 * h
    scan_size = 8 + 3 * w * 4
    offsets = b"".join(struct.pack("<Q", data_start + y * scan_size) for y in range(h))

    body = bytearray()
    for y in range(h):
        row = img[y]
        body += struct.pack("<iI", y, 3 * w * 4)
        body += row[:, 2].astype("<f4").tobytes()   # B
        body += row[:, 1].astype("<f4").tobytes()   # G
        body += row[:, 0].astype("<f4").tobytes()   # R
    with open(path, "wb") as f:
        f.write(magic + header + offsets + bytes(body))


def read_exr(path):
    """Reader for the subset written by write_exr (uncompressed float RGB)."""
    with open(path, "rb") as f:
        data = f.read()
    assert struct.unpack("<I", data[:4])[0] == 20000630, "not an EXR"
    pos = 8
    attrs = {}
    while data[pos] != 0:
        e = data.index(b"\x00", pos)
        name = data[pos:e].decode(); pos = e + 1
        e = data.index(b"\x00", pos)
        typ = data[pos:e].decode(); pos = e + 1
        (sz,) = struct.unpack("<I", data[pos:pos + 4]); pos += 4
        attrs[name] = (typ, data[pos:pos + sz]); pos += sz
    pos += 1
    xmin, ymin, xmax, ymax = struct.unpack("<4i", attrs["dataWindow"][1])
    w, h = xmax - xmin + 1, ymax - ymin + 1
    pos += 8 * h  # offset table
    img = np.zeros((h, w, 3), np.float32)
    for y in range(h):
        yy, sz = struct.unpack("<iI", data[pos:pos + 8]); pos += 8
        row = np.frombuffer(data[pos:pos + sz], "<f4").reshape(3, w); pos += sz
        img[yy - ymin, :, 2] = row[0]
        img[yy - ymin, :, 1] = row[1]
        img[yy - ymin, :, 0] = row[2]
    return img
