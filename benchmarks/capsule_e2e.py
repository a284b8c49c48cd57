"""
Capsule end-to-end on-chip record (VERDICT r4 #4): drive the FULL
production stack — `run_capsule.run()` over a synthetic Code Ocean capsule
(acquisition.json, laser_tiles.json, estimated flats, DarkMaster,
Ex_*_Em_* channel with OME-Zarr tiles) — and report per-phase wall times.
Reference analog: run_capsule.py:308-421 -> zarr_destriper.py:909-1211.

Reuses tests/test_run_capsule_e2e.py::build_capsule with the geometry
scaled up (module globals H/W/Z patched) so the destripe path exercises
the real multi-level plan rather than the unit-test toy shapes.

Usage: python benchmarks/capsule_e2e.py [Z H W]   (default 24 640 768)
"""

import json
import pathlib
import sys
import tempfile
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))

import numpy as np


def main(z=24, h=640, w=768):
    import test_run_capsule_e2e as cap

    from aind_smartspim_destripe_tpu import run_capsule
    from aind_smartspim_destripe_tpu.io.zarr import open_zarr

    cap.Z, cap.H, cap.W = z, h, w
    tmp = pathlib.Path(tempfile.mkdtemp(prefix="capsule_"))
    data, results = cap.build_capsule(tmp)

    t0 = time.perf_counter()
    run_capsule.run(
        data_folder=str(data),
        results_folder=str(results),
        scratch_folder=str(tmp / "scratch"),
    )
    wall = time.perf_counter() - t0

    tiles = ("471320_461360", "489620_461360")
    for tile in tiles:
        tg = open_zarr(
            str(results / "destriped_data" / "Ex_488_Em_525" / f"{tile}.zarr")
        )
        assert set(tg.keys()) == {"0", "1", "2"}, tg.keys()
        lvl0 = tg.attrs["multiscales"][0]
        assert lvl0["datasets"][0]["coordinateTransformations"][0][
            "scale"
        ] == [1.0, 1.0, 2.0, 1.8, 1.8]
        out = np.asarray(tg["0"][0, 0])
        assert out.dtype == np.uint16 and out.max() > 0

    prov = results / "image_destriping_Ex_488_Em_525_processing.json"
    doc = json.load(open(prov))
    names = [p["name"] for p in doc["processing_pipeline"]["data_processes"]]
    assert names == ["Image destriping", "Image flat-field correction"], names

    print(json.dumps({
        "metric": "capsule_e2e_onchip",
        "tiles": len(tiles),
        "tile_shape": [z, h, w],
        "wall_s": round(wall, 1),
        "verified": ["levels 0-2", "NGFF scales", "provenance JSON",
                     "uint16 output"],
    }), flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:4]] or [24, 640, 768]
    main(*args)
