"""
Full capsule end-to-end: synthesize the Code Ocean input conventions
(acquisition.json, laser_tiles.json, estimated flats, derivatives dark,
channel folder with OME-Zarr tiles), run run_capsule.run(), and verify the
destriped tiles, pyramids, metadata, and provenance JSON.
"""

import json
import os

import numpy as np
import pytest

from aind_smartspim_destripe_tpu import run_capsule
from aind_smartspim_destripe_tpu.io.writers import imsave
from aind_smartspim_destripe_tpu.io.zarr import group, open_zarr

H, W, Z = 96, 128, 16


def build_capsule(tmp):
    data = tmp / "data"
    results = tmp / "results"
    (data / "derivatives").mkdir(parents=True)
    results.mkdir()

    acq = {
        "tiles": [
            {
                "coordinate_transformations": [
                    {"type": "scale", "scale": ["1.8", "1.8", "2.0"]}
                ]
            }
        ]
    }
    (data / "acquisition.json").write_text(json.dumps(acq))
    (data / "laser_tiles.json").write_text(
        json.dumps({"0": ["471320_461360"], "1": ["489620_461360"]})
    )

    # estimated flats: one per laser side (imsave writes .tiff; the capsule
    # convention expects .tif, so rename)
    for side in (0, 1):
        # estimated flats are ~[1, 2] float tiffs (normalize_image output)
        flat_img = np.full((H, W), 1.0 + 0.25 * side, np.float32)
        imsave(str(data / f"flat_{side}.tiff"), flat_img)
        os.replace(
            str(data / f"flat_{side}.tiff"),
            str(data / f"estimated_flat_laser_Ex_488_Em_525_{side}.tif"),
        )

    imsave(str(data / "derivatives" / "DarkMaster_cropped.tiff"),
           np.full((H, W), 3, np.uint16))
    os.replace(
        str(data / "derivatives" / "DarkMaster_cropped.tiff"),
        str(data / "derivatives" / "DarkMaster_cropped.tif"),
    )

    rng = np.random.default_rng(1)
    ch = data / "Ex_488_Em_525"
    for tile in ("471320_461360", "489620_461360"):
        vol = np.clip(
            280
            + (rng.normal(size=(Z, H, 1)) * 50) * np.ones((1, 1, W))
            + rng.normal(size=(Z, H, W)) * 8,
            0,
            65535,
        ).astype(np.uint16)
        tg = group(str(ch / f"{tile}.zarr"))
        lvl0 = tg.create_dataset(
            0, shape=(1, 1, Z, H, W), chunks=(1, 1, 8, 64, 64), dtype=np.uint16
        )
        lvl0[:] = vol[None, None]
    return data, results


@pytest.mark.slow
def test_run_capsule_end_to_end(tmp_path):
    data, results = build_capsule(tmp_path)
    run_capsule.run(
        data_folder=str(data),
        results_folder=str(results),
        scratch_folder=str(tmp_path / "scratch"),
    )

    for tile in ("471320_461360", "489620_461360"):
        tile_group = open_zarr(
            str(results / "destriped_data" / "Ex_488_Em_525" / f"{tile}.zarr")
        )
        assert set(tile_group.keys()) == {"0", "1", "2"}
        lvl0 = tile_group["0"]
        assert tuple(lvl0.shape) == (1, 1, Z, H, W)
        out = np.asarray(lvl0[0, 0])
        assert out.dtype == np.uint16 and out.max() > 0
        ms = tile_group.attrs["multiscales"][0]
        assert ms["datasets"][0]["coordinateTransformations"][0]["scale"] == [
            1.0, 1.0, 2.0, 1.8, 1.8,
        ]

    prov = results / "image_destriping_Ex_488_Em_525_processing.json"
    assert prov.exists()
    doc = json.load(open(prov))
    names = [p["name"] for p in doc["processing_pipeline"]["data_processes"]]
    assert names == ["Image destriping", "Image flat-field correction"]


def test_run_capsule_dual_band_env(tmp_path, monkeypatch):
    """DESTRIPE_DUAL_BAND=1 routes the capsule's parameters into the
    dual-band mode (with the optional crossover/threshold overrides)."""
    data, results = build_capsule(tmp_path)
    captured = {}

    def fake_destripe_channel(parameters, **kw):
        captured.update(parameters)
        return {}

    monkeypatch.setattr(
        run_capsule.zarr_destriper, "destripe_channel",
        lambda **kw: fake_destripe_channel(**kw),
    )
    monkeypatch.setenv("DESTRIPE_DUAL_BAND", "1")
    monkeypatch.setenv("DESTRIPE_DUAL_CROSSOVER", "85.5")
    run_capsule.run(
        data_folder=str(data),
        results_folder=str(results),
        scratch_folder=str(tmp_path / "scratch"),
    )
    assert captured["dual_band"] is True
    assert captured["crossover"] == 85.5
    assert "dual_threshold" not in captured  # unset env leaves the default
