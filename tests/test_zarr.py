"""
Zarr v2 store tests: metadata layout, chunk round trips, slicing semantics,
the float->uint16 cast-on-assignment behavior the production pipeline relies
on, and group trees matching the reference output layout.
"""

import json
import os

import numpy as np
import pytest

from aind_smartspim_destripe_tpu.io import blosc
from aind_smartspim_destripe_tpu.io.zarr import (
    BloscCodec,
    ZarrArray,
    ZarrGroup,
    group,
    open_zarr,
)


def test_create_and_metadata(tmp_path):
    p = str(tmp_path / "a.zarr")
    arr = ZarrArray.create(p, shape=(10, 20), chunks=(4, 8), dtype=np.uint16)
    meta = json.load(open(os.path.join(p, ".zarray")))
    assert meta["zarr_format"] == 2
    assert meta["dtype"] == "<u2"
    assert meta["compressor"]["id"] == "blosc"
    assert meta["compressor"]["cname"] == "zstd"
    assert meta["dimension_separator"] == "/"
    assert arr.cdata_shape == (3, 3)


def test_roundtrip_exact(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.integers(0, 2**16, size=(33, 57), dtype=np.uint16)
    arr = ZarrArray.create(str(tmp_path / "a"), (33, 57), (8, 16), np.uint16)
    arr[:, :] = data
    np.testing.assert_array_equal(arr[:, :], data)
    np.testing.assert_array_equal(arr[5:20, 10:43], data[5:20, 10:43])
    np.testing.assert_array_equal(arr[7], data[7])
    assert arr[3, 4] == data[3, 4]


def test_5d_production_layout(tmp_path):
    """The production output geometry: (1,1,Z,Y,X) with chunks (1,1,64,128,128)
    and '/' separators (zarr_destriper.py:1066-1074)."""
    arr = ZarrArray.create(
        str(tmp_path / "t.zarr" / "0"),
        shape=(1, 1, 70, 150, 200),
        chunks=(1, 1, 64, 128, 128),
        dtype=np.uint16,
    )
    block = np.arange(70 * 150 * 200, dtype=np.uint16).reshape(1, 1, 70, 150, 200)
    arr[:, :, :, :, :] = block
    np.testing.assert_array_equal(arr[0, 0, 10:20, 100:140, 50:199], block[0, 0, 10:20, 100:140, 50:199])
    # chunk files live at nested "/" keys
    assert os.path.exists(str(tmp_path / "t.zarr" / "0" / "0" / "0" / "0" / "0" / "0"))
    assert os.path.exists(str(tmp_path / "t.zarr" / "0" / "0" / "0" / "1" / "1" / "1"))


def test_float_assignment_casts_like_zarr(tmp_path):
    """zarr casts on assignment with astype semantics; the reference writes
    the float array directly (zarr_destriper.py:336)."""
    arr = ZarrArray.create(str(tmp_path / "c"), (2, 2), (2, 2), np.uint16)
    arr[:, :] = np.array([[1.9, 100.7], [65535.2, 0.0]], dtype=np.float32)
    got = arr[:, :]
    np.testing.assert_array_equal(got, np.array([[1, 100], [65535, 0]], np.uint16))


def test_missing_chunks_fill_value(tmp_path):
    arr = ZarrArray.create(str(tmp_path / "f"), (8, 8), (4, 4), np.uint16, fill_value=7)
    arr[0:4, 0:4] = np.ones((4, 4), np.uint16)
    out = arr[:, :]
    assert (out[:4, :4] == 1).all()
    assert (out[4:, 4:] == 7).all()


def test_partial_chunk_read_modify_write(tmp_path):
    arr = ZarrArray.create(str(tmp_path / "p"), (8,), (5,), np.int32)
    arr[:] = np.arange(8, dtype=np.int32)
    arr[2:4] = np.array([100, 200], np.int32)
    np.testing.assert_array_equal(arr[:], [0, 1, 100, 200, 4, 5, 6, 7])


def test_group_tree_and_reopen(tmp_path):
    root = group(str(tmp_path / "root"))
    ch = root.create_group("Ex_488_Em_525")
    tile = ch.create_group("471320_461360.zarr")
    lvl0 = tile.create_dataset(
        0, shape=(1, 1, 16, 32, 32), chunks=(1, 1, 8, 16, 16), dtype=np.uint16
    )
    lvl0[:] = np.ones((1, 1, 16, 32, 32), np.uint16)
    tile.attrs["multiscales"] = [{"version": "0.4"}]

    reopened = open_zarr(str(tmp_path / "root"))
    assert isinstance(reopened, ZarrGroup)
    t = reopened["Ex_488_Em_525"]["471320_461360.zarr"]
    assert t.attrs["multiscales"][0]["version"] == "0.4"
    assert list(t.keys()) == ["0"]
    np.testing.assert_array_equal(t["0"][0, 0, 3], np.ones((32, 32), np.uint16))


def test_slab_fast_path_matches_per_chunk(tmp_path):
    """The native slab gather+encode / decode+scatter path (>= 8 aligned
    chunks) must be indistinguishable from the per-chunk path: ragged
    edges, missing chunks, 5-D leading dims, float fill, and non-aligned
    selections (which must fall back, not corrupt)."""
    rng = np.random.default_rng(0)
    Z, H, W = 16, 256, 500  # W ragged vs the 128 chunk
    vol = rng.integers(0, 65535, size=(Z, H, W), dtype=np.uint16)

    a = ZarrArray.create(str(tmp_path / "a"), (Z, H, W), (8, 128, 128),
                         np.uint16, fill_value=7)
    a[:, :, :] = vol
    np.testing.assert_array_equal(a[:, :, :], vol)
    # every chunk file stays decodable by the pure-python codec
    raw = open(str(tmp_path / "a" / "1" / "1" / "3"), "rb").read()
    assert len(blosc.decompress_py(raw)) == 8 * 128 * 128 * 2

    # aligned read with never-written chunks -> fill_value
    b = ZarrArray.create(str(tmp_path / "b"), (Z, H, W), (8, 128, 128),
                         np.uint16, fill_value=7)
    b[0:8] = vol[0:8]
    got = b[:, :, :]
    np.testing.assert_array_equal(got[0:8], vol[0:8])
    assert (got[8:] == 7).all()

    # 5-D production layout through the same path
    c = ZarrArray.create(str(tmp_path / "c"), (1, 1, Z, H, W),
                         (1, 1, 8, 128, 128), np.uint16)
    c[0:1, 0:1, 0:Z] = vol[None, None]
    np.testing.assert_array_equal(c[0, 0], vol)

    # non-aligned selection falls back and stays correct
    a[:, 3:200, 17:400] = np.zeros((Z, 197, 383), np.uint16)
    chk = a[:, :, :]
    assert (chk[:, 3:200, 17:400] == 0).all()
    np.testing.assert_array_equal(chk[:, :3], vol[:, :3])

    # float dtype with non-integer fill pattern
    d = ZarrArray.create(str(tmp_path / "d"), (16, 256, 256), (8, 128, 128),
                         np.float32, fill_value=1.5)
    fv = rng.normal(size=(8, 256, 256)).astype(np.float32)
    d[0:8] = fv
    gotf = d[:, :, :]
    np.testing.assert_array_equal(gotf[0:8], fv)
    assert (gotf[8:] == 1.5).all()


def test_slab_fast_path_geometry_fuzz(tmp_path):
    """Seeded geometry fuzz: random shapes/chunks/aligned+unaligned
    selections must round-trip identically whether or not the native slab
    path engages (it decides per call; this pins the decision logic)."""
    rng = np.random.default_rng(7)
    for case in range(12):
        nd = int(rng.integers(1, 4))
        shape = tuple(int(rng.integers(3, 40)) for _ in range(nd))
        chunks = tuple(int(rng.integers(2, s + 3)) for s in shape)
        p = str(tmp_path / f"f{case}")
        arr = ZarrArray.create(p, shape, chunks, np.uint16,
                               fill_value=int(rng.integers(0, 100)))
        ref = np.full(shape, arr.fill_value, np.uint16)
        for _ in range(3):
            sel = tuple(
                slice(lo := int(rng.integers(0, s)),
                      int(rng.integers(lo + 1, s + 1)))
                for s in shape
            )
            val = rng.integers(0, 65535,
                               size=tuple(s.stop - s.start for s in sel),
                               dtype=np.uint16)
            arr[sel] = val
            ref[sel] = val
            np.testing.assert_array_equal(arr[tuple(slice(0, s) for s in shape)], ref)


def test_write_recovers_from_externally_removed_dirs(tmp_path):
    """_ensure_dir memoizes created directories; if the store tree is
    removed externally mid-run (cleanup / retry recreating the store), a
    subsequent chunk write must recreate them, not FileNotFoundError."""
    import shutil

    arr = ZarrArray.create(
        str(tmp_path / "r"), (4, 4), (2, 2), np.uint16, dimension_separator="/"
    )
    arr[:, :] = np.ones((4, 4), np.uint16)
    shutil.rmtree(str(tmp_path / "r" / "0"))  # nuke a memoized chunk dir
    arr[:, :] = np.full((4, 4), 3, np.uint16)
    np.testing.assert_array_equal(arr[:, :], np.full((4, 4), 3, np.uint16))

    # the bulk (>= 8 chunks) slab/batch write paths share the same recovery
    # (round-4 review: the first fix only covered the per-chunk path)
    big = ZarrArray.create(
        str(tmp_path / "rb"), (16, 128, 128), (8, 32, 32), np.uint16,
        dimension_separator="/",
    )
    vol = np.arange(16 * 128 * 128, dtype=np.uint16).reshape(16, 128, 128)
    big[:, :, :] = vol
    shutil.rmtree(str(tmp_path / "rb" / "0"))
    big[:, :, :] = vol
    np.testing.assert_array_equal(big[:, :, :], vol)


def test_overwrite_semantics(tmp_path):
    p = str(tmp_path / "o")
    ZarrArray.create(p, (4,), (2,), np.uint16)
    with pytest.raises(FileExistsError):
        ZarrArray.create(p, (4,), (2,), np.uint16)
    ZarrArray.create(p, (6,), (2,), np.uint16, overwrite=True)
    assert ZarrArray.open(p).shape == (6,)


@pytest.mark.skipif(blosc.load_system_blosc() is None, reason="no system blosc")
def test_chunks_decodable_by_c_blosc(tmp_path):
    """Every chunk file we write must be a frame c-blosc (and hence
    zarr-python/numcodecs) can decode."""
    arr = ZarrArray.create(str(tmp_path / "i"), (64, 64), (32, 32), np.uint16)
    data = (np.arange(64 * 64, dtype=np.uint16)).reshape(64, 64)
    arr[:, :] = data
    raw = open(str(tmp_path / "i" / "0" / "0"), "rb").read()
    decoded = blosc.system_decompress(raw, 32 * 32 * 2)
    np.testing.assert_array_equal(
        np.frombuffer(decoded, np.uint16).reshape(32, 32), data[:32, :32]
    )


def test_zlib_codec_roundtrip(tmp_path):
    from aind_smartspim_destripe_tpu.io.zarr import ZlibCodec

    arr = ZarrArray.create(
        str(tmp_path / "z"), (16, 16), (8, 8), np.uint16, compressor=ZlibCodec(1)
    )
    data = np.arange(256, dtype=np.uint16).reshape(16, 16)
    arr[:, :] = data
    np.testing.assert_array_equal(ZarrArray.open(str(tmp_path / "z"))[:, :], data)


def test_gzip_and_zstd_codecs(tmp_path):
    from aind_smartspim_destripe_tpu.io.zarr import GzipCodec, ZstdCodec

    data = np.arange(64, dtype=np.uint16).reshape(8, 8)
    for name, codec in (("g", GzipCodec(1)), ("z", ZstdCodec(1))):
        arr = ZarrArray.create(
            str(tmp_path / name), (8, 8), (4, 4), np.uint16, compressor=codec
        )
        arr[:, :] = data
        np.testing.assert_array_equal(ZarrArray.open(str(tmp_path / name))[:, :], data)


def test_null_fill_value_tolerated(tmp_path):
    import json as _json

    p = str(tmp_path / "nf")
    arr = ZarrArray.create(p, (4, 4), (2, 2), np.uint16)
    meta = _json.load(open(os.path.join(p, ".zarray")))
    meta["fill_value"] = None
    _json.dump(meta, open(os.path.join(p, ".zarray"), "w"))
    reopened = ZarrArray.open(p)
    np.testing.assert_array_equal(reopened[:, :], np.zeros((4, 4), np.uint16))


def test_malformed_zarray_metadata_raises_valueerror(tmp_path):
    """Fuzz-derived contract: a corrupt .zarray raises ValueError (or the
    JSONDecodeError subclass), never KeyError/TypeError/ZeroDivisionError."""
    import json

    p = str(tmp_path / "m")
    ZarrArray.create(p, (8, 8), (4, 4), np.uint16)
    good = json.load(open(p + "/.zarray"))

    for mutate in (
        lambda m: m.pop("chunks"),              # missing key -> was KeyError
        lambda m: m.pop("shape"),
        lambda m: m.update(dtype=12345),        # junk dtype -> was TypeError
        lambda m: m.update(chunks=[4, 0]),      # zero chunk -> div-by-zero
        lambda m: m.update(shape=[-8, 8]),      # negative extent
        lambda m: m.update(chunks="nope"),      # non-iterable-of-int
    ):
        m = dict(good)
        mutate(m)
        json.dump(m, open(p + "/.zarray", "w"))
        with pytest.raises(ValueError):
            ZarrArray.open(p)


def test_zarray_geometry_type_confusion_rejected(tmp_path):
    """Review-derived: shape/chunks must be JSON integer arrays — a digit
    string would coerce element-wise ('88' -> (8, 8)) and floats silently
    truncate, fabricating geometry."""
    import json

    p = str(tmp_path / "t")
    ZarrArray.create(p, (8, 8), (4, 4), np.uint16)
    good = json.load(open(p + "/.zarray"))
    for field, val in (("shape", "88"), ("shape", [8.9, 8]),
                       ("chunks", "44"), ("chunks", [4.0, 4])):
        m = dict(good)
        m[field] = val
        json.dump(m, open(p + "/.zarray", "w"))
        with pytest.raises(ValueError):
            ZarrArray.open(p)
