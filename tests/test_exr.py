"""OpenEXR export (render/exr.py — linear HDR, beyond the reference's
8-bit-only save path, reference src/custom_image.rs:92-101).

The environment has no EXR library, so these tests validate the writer
against an INDEPENDENT minimal parser written directly from the OpenEXR
2.0 specification (magic/version, attribute list, chlist layout, the
scanline offset table, NO_COMPRESSION/ZIPS/ZIP block framing and the zip
byte-interleave + delta predictor) — a writer bug in the header or block
framing cannot cancel out in the reader because the reader seeks through
the file by its own offset arithmetic AND cross-checks the written
offset table.
"""

import struct
import zlib

import numpy as np
import pytest

from spectral_tpu.render.exr import write_exr, write_exr_layers


def _unzip_block(data: bytes, raw_size: int) -> bytes:
    """Inverse of the EXR zip transform (spec/ImfZip.cpp): deflate,
    then undo the delta predictor, then un-interleave. A block whose
    stored size equals the raw size is stored uncompressed."""
    if len(data) == raw_size:
        return data
    t = np.frombuffer(zlib.decompress(data), np.uint8).astype(np.int64)
    assert len(t) == raw_size
    # predictor forward was d[i] = t[i] - t[i-1] + 384 (mod 256)
    e = t.copy()
    e[1:] -= 128 + 256
    t = (np.cumsum(e) % 256).astype(np.uint8)
    half = (raw_size + 1) // 2
    out = np.empty(raw_size, np.uint8)
    out[0::2] = t[:half]
    out[1::2] = t[half:]
    return out.tobytes()


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
    assert [n for n, _ in channels] == sorted(n for n, _ in channels)

    _, dw = attrs[b"dataWindow"]
    x0, y0, x1, y1 = struct.unpack("<4i", dw)
    w, h = x1 - x0 + 1, y1 - y0 + 1
    comp_id = attrs[b"compression"][1][0]
    lines_per_block = {0: 1, 2: 1, 3: 16}[comp_id]
    assert attrs[b"lineOrder"][1] == b"\0"  # increasing Y

    n_blocks = (h + lines_per_block - 1) // lines_per_block
    offsets = struct.unpack_from("<%dQ" % n_blocks, raw, pos)
    pos += 8 * n_blocks

    dtypes = {1: np.dtype("<f2"), 2: np.dtype("<f4")}
    row_bytes = sum(dtypes[pt].itemsize for _, pt in channels) * w
    planes = {name: np.empty((h, w), np.float32) for name, _ in channels}
    for i, off in enumerate(offsets):
        # the first block must start right after the offset table, and
        # blocks must be contiguous — cross-checks the writer's offsets
        assert off == (pos if i == 0 else offsets[i - 1] + prev_size)
        y, size = struct.unpack_from("<ii", raw, off)
        assert y == i * lines_per_block
        y_hi = min(y + lines_per_block, h)
        raw_size = (y_hi - y) * row_bytes
        data = _unzip_block(raw[off + 8:off + 8 + size], raw_size)
        p = 0
        for yy in range(y, y_hi):
            for name, ptype in channels:
                dt = dtypes[ptype]
                row = np.frombuffer(data, dt, count=w, offset=p)
                planes[name][yy] = row.astype(np.float32)
                p += w * dt.itemsize
        assert p == raw_size
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


@pytest.mark.parametrize("compression", ["none", "zips", "zip"])
def test_float_round_trip_bit_exact(tmp_path, compression):
    img = _hdr_image(h=37)  # > 2 ZIP blocks, ragged last block
    p = write_exr(
        img, tmp_path / "x.exr", pixel_type="float", compression=compression
    )
    planes, channels, (w, h) = _read_exr(p)
    assert (w, h) == (11, 37)
    assert [n for n, _ in channels] == [b"A", b"B", b"G", b"R"]  # sorted
    assert all(pt == 2 for _, pt in channels)
    for name, ch in ((b"R", 0), (b"G", 1), (b"B", 2), (b"A", 3)):
        np.testing.assert_array_equal(
            planes[name].view(np.uint32), img[..., ch].view(np.uint32)
        )


def test_zip_compresses_real_renders(tmp_path):
    """On smooth render-like data ZIP must actually shrink the file."""
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
    img = np.stack([yy / 64, xx / 64, (yy + xx) / 128], axis=-1)
    p_none = write_exr(img, tmp_path / "n.exr", compression="none")
    p_zip = write_exr(img, tmp_path / "z.exr", compression="zip")
    assert p_zip.stat().st_size < p_none.stat().st_size / 2
    a, _, _ = _read_exr(p_none)
    b, _, _ = _read_exr(p_zip)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_half_round_trip_is_f16(tmp_path):
    img = _hdr_image(seed=1)
    p = write_exr(img, tmp_path / "x.exr")  # default: half + zip
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


def test_multilayer_beauty_plus_aovs(tmp_path):
    """Beauty + normal + depth in ONE file with dotted layer channels."""
    rng = np.random.default_rng(7)
    beauty = rng.standard_normal((20, 13, 4)).astype(np.float32)
    normal = rng.standard_normal((20, 13, 3)).astype(np.float32)
    depth = rng.standard_normal((20, 13)).astype(np.float32) * 100.0
    p = write_exr_layers(
        {"": beauty, "normal": normal, "depth": depth},
        tmp_path / "ml.exr", pixel_type="float",
    )
    planes, channels, (w, h) = _read_exr(p)
    assert (w, h) == (13, 20)
    names = [n for n, _ in channels]
    assert names == sorted(
        [b"R", b"G", b"B", b"A",
         b"normal.R", b"normal.G", b"normal.B", b"depth.Z"]
    )
    np.testing.assert_array_equal(planes[b"R"], beauty[..., 0])
    np.testing.assert_array_equal(planes[b"normal.B"], normal[..., 2])
    np.testing.assert_array_equal(planes[b"depth.Z"], depth)


def test_write_exr_validates(tmp_path):
    with pytest.raises(ValueError, match="H, W"):
        write_exr(np.zeros((4, 4)), tmp_path / "x.exr")
    with pytest.raises(ValueError, match="pixel_type"):
        write_exr(np.zeros((2, 2, 3)), tmp_path / "x.exr",
                  pixel_type="double")
    with pytest.raises(ValueError, match="compression"):
        write_exr(np.zeros((2, 2, 3)), tmp_path / "x.exr",
                  compression="piz")
    with pytest.raises(ValueError, match="resolution"):
        write_exr_layers(
            {"": np.zeros((2, 2, 3)), "d": np.zeros((3, 2))},
            tmp_path / "x.exr",
        )
    with pytest.raises(ValueError, match="empty"):
        write_exr_layers({}, tmp_path / "x.exr")


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
