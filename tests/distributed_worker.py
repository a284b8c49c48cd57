"""Worker process for the 2-process jax.distributed test (multi-host DCN
tier, SURVEY.md §5 "Distributed communication backend"). Launched by
tests/test_distributed_multihost.py with a shared coordinator port; runs
destripe_channel over a shared 4-tile channel and reports which tiles this
process owned plus a cross-host global_stats reduction."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    root, port, pid, nprocs, out_json = (
        sys.argv[1],
        sys.argv[2],
        int(sys.argv[3]),
        int(sys.argv[4]),
        sys.argv[5],
    )
    import jax

    jax.config.update("jax_platforms", "cpu")  # before first backend use

    import numpy as np

    from aind_smartspim_destripe_tpu import zarr_destriper as zd
    from aind_smartspim_destripe_tpu.parallel.distributed import (
        global_stats,
        initialize_distributed,
    )

    initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    assert jax.process_count() == nprocs

    laser_tiles = json.load(open(f"{root}/laser_tiles.json"))
    params = {
        "no_cells_config": {"wavelet": "db3", "level": None, "sigma": 128, "max_threshold": 12},
        "cells_config": {"wavelet": "db3", "level": None, "sigma": 64, "max_threshold": 3},
    }
    stats = zd.destripe_channel(
        zarr_dataset_path=root,
        derivatives_path=None,
        channel_name="Ex_488_Em_525",
        results_folder=f"{root}/results",
        xyz_resolution=(1.8, 1.8, 2.0),
        estimated_channel_flats=[f"{root}/flat.tif"],
        laser_tiles=laser_tiles,
        parameters=params,
    )
    gs = global_stats(np.array([pid + 1.0, 1.0]))
    json.dump(
        {
            "process_id": pid,
            "process_count": jax.process_count(),
            "tiles": sorted(stats),
            "planes": {k: v.planes for k, v in stats.items()},
            "global_stats": np.asarray(gs).tolist(),
        },
        open(out_json, "w"),
    )


if __name__ == "__main__":
    main()
