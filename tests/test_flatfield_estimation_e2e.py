"""
Flat-field estimation over a synthetic SmartSPIM file tree: exercises
utils.read_image_directory_structure -> slide_flat_estimation (destripe +
BaSiC fit per slide) -> unify_fields (reference flatfield_estimation.py
surface, whose tests were fully commented out upstream).
"""

import numpy as np
import pytest

from aind_smartspim_destripe_tpu.flatfield_estimation import (
    slide_flat_estimation,
    unify_fields,
)
from aind_smartspim_destripe_tpu.io.writers import imsave
from aind_smartspim_destripe_tpu.utils import utils

H, W = 48, 64

CFG = {"wavelet": "db3", "level": None, "sigma": 64, "max_threshold": 12}


@pytest.fixture()
def smartspim_tree(tmp_path):
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H, 0:W]
    flat_true = 1.0 + 0.3 * np.exp(
        -((yy - H / 2) ** 2 + (xx - W / 2) ** 2) / (2 * (H / 3) ** 2)
    )
    ch = tmp_path / "Ex_488_Em_525"
    cols = ["471320", "489620"]
    rows = ["461360", "470000"]
    for col in cols:
        for row in rows:
            d = ch / col / f"{col}_{row}"
            d.mkdir(parents=True)
            for z in range(2):
                base = rng.uniform(300, 600)
                img = np.clip(
                    base * flat_true + rng.normal(size=(H, W)) * 10, 0, 65535
                ).astype(np.uint16)
                imsave(str(d / f"{z}.tiff"), img)
    return tmp_path, flat_true


def test_slide_flat_estimation_and_unify(smartspim_tree):
    root, flat_true = smartspim_tree
    struct = utils.read_image_directory_structure(str(root), "Ex_.*")
    channel = list(struct.keys())[0]

    per_slide = slide_flat_estimation(
        dict_struct=struct,
        channel_name=channel,
        slide_idxs=[0, 1],
        shading_parameters=dict(
            get_darkfield=False,
            smoothness_flatfield=1.0,
            sort_intensity=True,
            max_reweight_iterations=2,
            working_size=32,
        ),
        no_cells_config=CFG,
        cells_config=CFG,
    )
    assert set(per_slide.keys()) == {0, 1}
    for idx in (0, 1):
        res = per_slide[idx]
        assert res["flatfield"].shape == (H, W)
        assert len(res["data"]) == 4  # 2 cols x 2 rows

    flat, dark, base = unify_fields(
        [per_slide[i]["flatfield"] for i in (0, 1)],
        [per_slide[i]["darkfield"] for i in (0, 1)],
        [per_slide[i]["baseline"] for i in (0, 1)],
        mode="median",
    )
    assert flat.dtype == np.float16
    corr = np.corrcoef(flat.astype(np.float64).ravel(), flat_true.ravel())[0, 1]
    assert corr > 0.8, f"estimated flat correlation {corr:.3f}"
