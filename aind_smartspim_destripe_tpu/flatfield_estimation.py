"""
Flat-field / dark-field / baseline estimation from sample slides (reference
surface: code/aind_smartspim_destripe/flatfield_estimation.py).

Same three-function API — ``shading_correction`` (fit the shading model over
destriped tiles), ``unify_fields`` (median/mean/mip combination, float16
cast), ``slide_flat_estimation`` (walk the SmartSPIM col/row tree, destripe
each tile, fit per slide) — with the BaSiCPy dependency replaced by the
TPU-native BaSiC model in models/basic.py.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from .filtering import filter_stripes
from .io.readers import imread
from .models.basic import BaSiC

__all__ = ["shading_correction", "unify_fields", "slide_flat_estimation"]


def shading_correction(
    slides: List[np.ndarray],
    shading_parameters: dict,
    mask: Optional[np.ndarray] = None,
) -> dict:
    """Fit the shading model over a stack of (destriped) tiles (reference
    flatfield_estimation.py:15-52)."""
    shading_obj = BaSiC(**shading_parameters)
    shading_obj.fit(images=np.array(slides), fitting_weight=mask)
    return {
        "flatfield": shading_obj.flatfield,
        "darkfield": shading_obj.darkfield,
        "baseline": shading_obj.baseline,
    }


def unify_fields(
    flatfields: List[np.ndarray],
    darkfields: List[np.ndarray],
    baselines: List[np.ndarray],
    mode: Optional[str] = "median",
):
    """Combine per-slide fits into single float16 fields (reference
    flatfield_estimation.py:55-122)."""
    flatfields = np.array(flatfields)
    darkfields = np.array(darkfields)
    baselines = np.array(baselines)

    if mode == "median":
        flatfield = np.median(flatfields, axis=0)
        darkfield = np.median(darkfields, axis=0)
        baseline = np.median(baselines, axis=0)
    elif mode == "mean":
        flatfield = np.mean(flatfields, axis=0)
        darkfield = np.mean(darkfields, axis=0)
        baseline = np.mean(baselines, axis=0)
    elif mode == "mip":
        flatfield = np.max(flatfields, axis=0)
        darkfield = np.min(darkfields, axis=0)
        baseline = np.max(baselines, axis=0)
    else:
        raise NotImplementedError("Accepted values are: ['mean', 'median', 'mip']")

    return (
        flatfield.astype(np.float16),
        darkfield.astype(np.float16),
        baseline.astype(np.float16),
    )


def slide_flat_estimation(
    dict_struct: dict,
    channel_name: str,
    slide_idxs: List[int],
    shading_parameters: dict,
    no_cells_config: dict,
    cells_config: dict,
) -> dict:
    """Per-slide shading fits over destriped tiles of a SmartSPIM channel
    tree (reference flatfield_estimation.py:125-196). ``dict_struct`` is the
    utils.read_image_directory_structure output."""
    dict_struct = dict_struct[channel_name]
    cols = list(dict_struct.keys())
    rows = [row.split("_")[-1] for row in list(dict_struct[cols[0]].keys())]
    row_name = f"{cols[0]}_{rows[0]}"

    shading_correction_per_slide = {}
    for slide_idx in slide_idxs:
        slide_name = dict_struct[cols[0]][row_name][slide_idx]
        slide_tiles = []
        for col in cols:
            for row in rows:
                input_tile_path = f"{channel_name}/{col}/{col}_{row}/{slide_name}"
                data = imread(input_tile_path)
                data_destriped = filter_stripes(
                    image=np.asarray(data),
                    input_tile_path=input_tile_path,
                    no_cells_config=no_cells_config,
                    cells_config=cells_config,
                )
                slide_tiles.append(data_destriped)

        shading_correction_per_slide[slide_idx] = shading_correction(
            slides=slide_tiles, shading_parameters=shading_parameters
        )
        shading_correction_per_slide[slide_idx]["data"] = slide_tiles

    return shading_correction_per_slide
