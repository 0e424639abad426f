"""OpenEXR export (render/exr.py — linear HDR, beyond the reference's
8-bit-only save path, reference src/custom_image.rs:92-101).

The environment has no EXR library, so these tests validate the writer
against an INDEPENDENT minimal parser written directly from the OpenEXR
2.0 specification (magic/version, attribute list, chlist layout, the
scanline offset table, and one-scanline NO_COMPRESSION blocks) — a
writer bug in the header or block framing cannot cancel out in the
reader because the reader seeks through the file by its own offset
arithmetic AND cross-checks the written offset table.
"""

import struct

import numpy as np
import pytest

from spectral_tpu.render.exr import write_exr


def _read_exr(path):
    """Independent minimal OpenEXR scanline reader (spec-derived)."""
    raw = open(path, "rb").read()
    magic, version = struct.unpack_from("<ii", raw, 0)
    assert magic == 20000630, hex(magic)
    assert version == 2, version  # single-part scanline, short names
    pos = 8

    def cstr(p):
        end = raw.index(b"\0", p)
        return raw[p:end], end + 1

    attrs = {}
    while True:
        if raw[pos:pos + 1] == b"\0":  # end of header
            pos += 1
            break
        name, pos = cstr(pos)
        type_, pos = cstr(pos)
        (size,) = struct.unpack_from("<i", raw, pos)
        pos += 4
        attrs[name] = (type_, raw[pos:pos + size])
        pos += size

    # channel list
    chtype, chdata = attrs[b"channels"]
    assert chtype == b"chlist"
    channels = []
    cpos = 0
    while chdata[cpos:cpos + 1] != b"\0":
        cend = chdata.index(b"\0", cpos)
        cname = chdata[cpos:cend]
        ptype, _pl, _r0, _r1, _r2, xs, ys = struct.unpack_from(
            "<iBBBBii", chdata, cend + 1
        )
        assert (xs, ys) == (1, 1)
        channels.append((cname, ptype))
        cpos = cend + 1 + 16
    assert chdata[cpos:] == b"\0"

    _, dw = attrs[b"dataWindow"]
    x0, y0, x1, y1 = struct.unpack("<4i", dw)
    w, h = x1 - x0 + 1, y1 - y0 + 1
    assert attrs[b"compression"][1] == b"\0"  # NO_COMPRESSION
    assert attrs[b"lineOrder"][1] == b"\0"  # increasing Y

    offsets = struct.unpack_from("<%dQ" % h, raw, pos)
    pos += 8 * h

    dtypes = {1: np.dtype("<f2"), 2: np.dtype("<f4")}
    planes = {name: np.empty((h, w), np.float32) for name, _ in channels}
    for i, off in enumerate(offsets):
        # the first block must start right after the offset table, and
        # blocks must be contiguous — cross-checks the writer's offsets
        assert off == (pos if i == 0 else offsets[i - 1] + prev_size)
        y, size = struct.unpack_from("<ii", raw, off)
        assert y == i
        p = off + 8
        for name, ptype in channels:
            dt = dtypes[ptype]
            row = np.frombuffer(raw, dt, count=w, offset=p)
            planes[name][y] = row.astype(np.float32)
            p += w * dt.itemsize
        assert p - off - 8 == size
        prev_size = 8 + size
    assert offsets[-1] + prev_size == len(raw)  # no trailing garbage
    return planes, channels, (w, h)


def _hdr_image(h=7, w=11, c=4, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.standard_normal((h, w, c)).astype(np.float32) * 10.0
    img[0, 0, 0] = 1e6  # HDR: far beyond the u8 clamp
    img[0, 1, 1] = -3.5  # out-of-gamut negative (documented behavior)
    img[1, 0, 2] = np.inf
    img[1, 1, 0] = np.nan
    return img


def test_float_round_trip_bit_exact(tmp_path):
    img = _hdr_image()
    p = write_exr(img, tmp_path / "x.exr", pixel_type="float")
    planes, channels, (w, h) = _read_exr(p)
    assert (w, h) == (11, 7)
    assert [n for n, _ in channels] == [b"A", b"B", b"G", b"R"]  # sorted
    assert all(pt == 2 for _, pt in channels)
    for name, ch in ((b"R", 0), (b"G", 1), (b"B", 2), (b"A", 3)):
        np.testing.assert_array_equal(
            planes[name].view(np.uint32), img[..., ch].view(np.uint32)
        )


def test_half_round_trip_is_f16(tmp_path):
    img = _hdr_image(seed=1)
    p = write_exr(img, tmp_path / "x.exr")  # default: half
    planes, channels, _ = _read_exr(p)
    assert all(pt == 1 for _, pt in channels)
    with np.errstate(over="ignore"):  # 1e6 -> +inf is the point
        want = img.astype(np.float16).astype(np.float32)
    assert np.isposinf(planes[b"R"][0, 0])  # 1e6 saturates to +inf
    for name, ch in ((b"R", 0), (b"G", 1), (b"B", 2), (b"A", 3)):
        np.testing.assert_array_equal(
            np.nan_to_num(planes[name], nan=-7.0),
            np.nan_to_num(want[..., ch], nan=-7.0),
        )


def test_rgb_only_and_alpha_drop(tmp_path):
    img3 = _hdr_image(c=3, seed=2)
    planes, channels, _ = _read_exr(write_exr(img3, tmp_path / "a.exr"))
    assert [n for n, _ in channels] == [b"B", b"G", b"R"]
    img4 = _hdr_image(seed=3)
    planes, channels, _ = _read_exr(
        write_exr(img4, tmp_path / "b.exr", alpha=False)
    )
    assert [n for n, _ in channels] == [b"B", b"G", b"R"]
    np.testing.assert_array_equal(
        planes[b"G"], img4[..., 1].astype(np.float16).astype(np.float32)
    )


def test_write_exr_validates():
    with pytest.raises(ValueError, match="H, W"):
        write_exr(np.zeros((4, 4)), "/tmp/x.exr")
    with pytest.raises(ValueError, match="pixel_type"):
        write_exr(np.zeros((2, 2, 3)), "/tmp/x.exr", pixel_type="double")


def test_save_image_dispatches_exr(tmp_path):
    """End-to-end: a real render saved as .exr carries the LINEAR
    accumulator (no u8 clamp, no display transform)."""
    from spectral_tpu.render import image as image_mod
    from spectral_tpu.render.renderer import Renderer
    from spectral_tpu.scene import presets

    sc = presets.default_scene()
    sc.width, sc.height, sc.nbr_of_iterations = 24, 16, 2
    sc.nbr_of_ray_bounces = 2
    r = Renderer(sc, backend="jnp")
    r.render()
    fb = np.asarray(r.framebuffer(), np.float32)
    p = image_mod.save_image(fb, tmp_path / "render.exr")
    planes, _, (w, h) = _read_exr(p)
    assert (w, h) == (24, 16)
    np.testing.assert_array_equal(
        planes[b"R"], fb[..., 0].astype(np.float16).astype(np.float32)
    )
    # exposure/gamma compose (applied to the float data, then written)
    p2 = image_mod.save_image(fb, tmp_path / "e.exr", exposure=2.0)
    planes2, _, _ = _read_exr(p2)
    want = (np.clip(fb[..., 0], 0, None) * 2.0).astype(np.float16)
    np.testing.assert_array_equal(planes2[b"R"], want.astype(np.float32))
