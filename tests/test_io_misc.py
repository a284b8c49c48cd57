"""
Tests for readers/writers, blocked writer logic, and NGFF metadata — mirrors
the reference's unit expectations (tests/test_blocked_zarr_writer.py,
tests/test_readers.py) plus structure checks on the OME metadata.
"""

import numpy as np
import pytest

from aind_smartspim_destripe_tpu.io import ngff, readers, writers
from aind_smartspim_destripe_tpu.io.blocked_writer import (
    BlockedArrayWriter,
    expand_chunks,
)
from aind_smartspim_destripe_tpu.io.zarr import ZarrArray, group


# ---------------------------------------------------------------------------
# readers / writers
# ---------------------------------------------------------------------------


def test_raw_imread_endianness(tmp_path):
    # little-endian file: width=4, height=3
    p = tmp_path / "img.raw"
    data = np.arange(12, dtype="<u2").reshape(4, 3)
    with open(p, "wb") as f:
        f.write(np.array([4, 3], dtype="<u4").tobytes())
        f.write(data.tobytes())
    out = readers.raw_imread(str(p))
    assert out.dtype == np.dtype("<u2") or out.dtype == np.uint16
    np.testing.assert_array_equal(np.asarray(out), data)

    # big-endian file
    p2 = tmp_path / "img_be.raw"
    with open(p2, "wb") as f:
        f.write(np.array([4, 3], dtype=">u4").tobytes())
        f.write(data.astype(">u2").tobytes())
    out2 = readers.raw_imread(str(p2))
    np.testing.assert_array_equal(np.asarray(out2), data)


def test_imread_tiff_png_roundtrip(tmp_path):
    img = (np.arange(300, dtype=np.uint16) * 200).reshape(15, 20)
    writers.imsave(str(tmp_path / "a.tiff"), img)
    np.testing.assert_array_equal(readers.imread(str(tmp_path / "a.tiff")), img)
    writers.imsave(str(tmp_path / "b.tiff"), img, output_format=".png")
    np.testing.assert_array_equal(readers.imread(str(tmp_path / "b.png")), img)


def test_imsave_reextensions_raw_and_png_to_tiff(tmp_path):
    img = np.ones((4, 4), np.uint16)
    writers.imsave(str(tmp_path / "c.raw"), img)  # no output_format
    assert (tmp_path / "c.tiff").exists()
    writers.imsave(str(tmp_path / "d.png"), img)
    assert (tmp_path / "d.tiff").exists()


def test_imsave_compression_level_changes_bytes(tmp_path):
    """The compression arg is a real deflate level (reference destriper.py
    75-87 passes compressionargs={'level': N}): higher level -> no larger
    file, any level -> smaller than uncompressed, content identical."""
    rng = np.random.default_rng(0)
    base = np.linspace(100, 4000, 256 * 256).reshape(256, 256)
    img = (base + rng.normal(scale=3.0, size=base.shape)).astype(np.uint16)
    sizes = {}
    for level in (0, 1, 6, 9):
        p = tmp_path / f"l{level}.tiff"
        writers.imsave(str(p), img, compression=level)
        sizes[level] = p.stat().st_size
        np.testing.assert_array_equal(readers.imread(str(p)), img)
        # PIL must also decode our deflate strips (external-tool interop)
        from PIL import Image

        np.testing.assert_array_equal(np.asarray(Image.open(str(p))), img)
    assert sizes[1] < sizes[0]
    assert sizes[9] <= sizes[6] <= sizes[1]
    assert sizes[6] < sizes[1]  # the level genuinely reaches the encoder


def test_imsave_rejects_unknown(tmp_path):
    with pytest.raises(NotImplementedError):
        writers.imsave(str(tmp_path / "x.jpg"), np.ones((2, 2), np.uint16))
    with pytest.raises(ValueError):
        writers.imsave(
            str(tmp_path / "x.tiff"), np.ones((2, 2), np.uint16), output_format=".jpg"
        )


def test_imread_unknown_extension_returns_none(tmp_path):
    assert readers.imread(str(tmp_path / "x.bmp")) is None


# ---------------------------------------------------------------------------
# blocked writer (reference tests/test_blocked_zarr_writer.py expectations)
# ---------------------------------------------------------------------------


def test_expand_chunks_cycle_and_iso():
    # Mirrors the reference's unit expectation: both modes reach (4, 4, 4)
    target = 4 * 4 * 4 * 2
    assert expand_chunks((1, 1, 1), (10, 10, 10), target, 2, "cycle") == (4, 4, 4)
    assert expand_chunks((1, 1, 1), (10, 10, 10), target, 2, "iso") == (4, 4, 4)


def test_expand_chunks_validation():
    with pytest.raises(ValueError):
        expand_chunks((0, 1, 1), (4, 4, 4), 100, 2)
    with pytest.raises(ValueError):
        expand_chunks((5, 1, 1), (4, 4, 4), 100, 2)
    with pytest.raises(ValueError):
        expand_chunks((1, 1, 1), (4, 4, 4), 0, 2)
    with pytest.raises(ValueError):
        expand_chunks((1, 1, 1), (4, 4, 4), 100, 0)
    with pytest.raises(ValueError):
        expand_chunks((1, 1, 1), (4, 4, 4), 100, 2, mode="bogus")


def test_gen_slices_counts_and_tails():
    slices = list(BlockedArrayWriter.gen_slices((5, 5), (2, 2)))
    assert len(slices) == 9
    assert slices[0] == (slice(0, 2), slice(0, 2))
    assert slices[-1] == (slice(4, 5), slice(4, 5))
    with pytest.raises(Exception):
        list(BlockedArrayWriter.gen_slices((5, 5), (2,)))


def test_store_into_zarr(tmp_path):
    src = np.arange(6 * 7, dtype=np.uint16).reshape(6, 7)
    dst = ZarrArray.create(str(tmp_path / "d"), (6, 7), (4, 4), np.uint16)
    BlockedArrayWriter.store(src, dst, (3, 5))
    np.testing.assert_array_equal(dst[:, :], src)
    dst2 = ZarrArray.create(str(tmp_path / "d2"), (6, 7), (4, 4), np.uint16)
    BlockedArrayWriter.store(src, dst2, (3, 5), n_threads=4)
    np.testing.assert_array_equal(dst2[:, :], src)


def test_get_block_shape_from_zarr(tmp_path):
    arr = ZarrArray.create(
        str(tmp_path / "g"), (1, 1, 64, 256, 256), (1, 1, 16, 64, 64), np.uint16
    )
    bs = BlockedArrayWriter.get_block_shape(arr, target_size_mb=1)
    assert len(bs) == 3
    assert all(b >= c for b, c in zip(bs, (16, 64, 64)))


# ---------------------------------------------------------------------------
# NGFF metadata
# ---------------------------------------------------------------------------


def test_compute_scales_doubling():
    transforms, chunk_opts = ngff.compute_scales(
        3, (2, 2, 2), (2.0, 1.8, 1.8), (1, 1, 64, 128, 128), (1, 1, 100, 1600, 2000)
    )
    assert len(transforms) == 3 and len(chunk_opts) == 3
    assert transforms[0][0]["scale"] == [1.0, 1.0, 2.0, 1.8, 1.8]
    assert transforms[1][0]["scale"] == [1.0, 1.0, 4.0, 3.6, 3.6]
    assert transforms[2][0]["scale"] == [1.0, 1.0, 8.0, 7.2, 7.2]
    assert chunk_opts[0]["chunks"] == (1, 1, 64, 128, 128)
    assert chunk_opts[2]["chunks"] == (1, 1, 25, 128, 128)


def test_write_ome_ngff_metadata_structure(tmp_path):
    g = group(str(tmp_path / "tile.zarr"))
    ngff.write_ome_ngff_metadata(
        group=g,
        shape=(1, 1, 100, 1600, 2000),
        chunksize=(1, 1, 64, 128, 128),
        image_name="471320_461360.zarr",
        n_lvls=3,
        scale_factors=(2, 2, 2),
        voxel_size=(2.0, 1.8, 1.8),
        channel_names=["471320_461360.zarr"],
        channel_colors=[0x690AFE],
        channel_minmax=[(0, 65535)],
        channel_startend=[(0.0, 350.0)],
    )
    ms = g.attrs["multiscales"]
    assert ms[0]["version"] == "0.4"
    assert [a["name"] for a in ms[0]["axes"]] == ["t", "c", "z", "y", "x"]
    assert [d["path"] for d in ms[0]["datasets"]] == ["0", "1", "2"]
    om = g.attrs["omero"]
    assert om["channels"][0]["color"] == "690afe"
    assert om["channels"][0]["window"]["end"] == 350.0
    assert om["rdefs"]["defaultZ"] == 50
