"""
Mirrors of the reference's own edge-case unit tests that had no direct
counterpart here (reference code/tests/test_filtering.py:68-113,
test_blocked_zarr_writer.py:21-42, test_utils.py). Each asserts the exact
expectation the reference test pins.
"""

import multiprocessing
import time

import numpy as np

from aind_smartspim_destripe_tpu import filtering
from aind_smartspim_destripe_tpu.io import writers
from aind_smartspim_destripe_tpu.io.blocked_writer import _closer_to_target
from aind_smartspim_destripe_tpu.utils.utils import stop_child_process


def test_empty_image_get_foreground_background_mean():
    # reference test_filtering.py:68-83
    img = np.array([])
    fg, bg, mask = filtering.get_foreground_background_mean(img, 0.3)
    assert fg == 0.0 and bg == 0.0
    np.testing.assert_array_equal(mask, img)


def test_no_foreground():
    # reference test_filtering.py:85-99: threshold 1.0 excludes everything
    img = np.array([10, 20, 30, 40, 50])
    fg, bg, mask = filtering.get_foreground_background_mean(img, 1.0)
    assert fg == 0.0
    assert bg == img.mean()
    assert mask.sum() == 0


def test_no_background():
    # reference test_filtering.py:101-113: threshold 0.0 includes everything
    img = np.array([400, 420, 430, 440, 460])
    fg, bg, mask = filtering.get_foreground_background_mean(img, 0.0)
    assert fg == img.mean()
    assert bg == 0.0
    assert mask.sum() == mask.size


def test_closer_to_target():
    # reference test_blocked_zarr_writer.py:21-42
    assert _closer_to_target((4, 4), (8, 8), 30, 1) == (4, 4)
    assert _closer_to_target((4, 4), (8, 8), 60, 1) == (8, 8)


def test_get_extension():
    # reference test_utils: ".tiff" from a dotted path
    assert writers._get_extension("/a/b/image.v2.tiff") == ".tiff"
    assert writers._get_extension("plain.raw") == ".raw"


def test_stop_child_process():
    # reference test_utils.py stop_child_process: terminates and joins
    p = multiprocessing.Process(target=time.sleep, args=(60,))
    p.start()
    stop_child_process(p)
    assert not p.is_alive()
