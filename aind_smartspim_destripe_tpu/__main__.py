"""
CLI entry points.

``python -m aind_smartspim_destripe_tpu capsule [--data ... --results ...]``
runs the production capsule flow (reference: run_capsule.py / the ``run``
shell script). ``python -m aind_smartspim_destripe_tpu batch --input_path ...
--output_path ...`` runs the legacy file-batch path with the
destriper_params surface (reference: destriper_params.py CLI)."""

from __future__ import annotations

import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    mode = argv.pop(0) if argv and not argv[0].startswith("-") else "capsule"

    if mode == "capsule":
        import argparse

        p = argparse.ArgumentParser(prog="smartspim-destripe capsule")
        p.add_argument("--data", default="../data")
        p.add_argument("--results", default="../results")
        p.add_argument("--scratch", default="../scratch")
        ns = p.parse_args(argv)
        from .run_capsule import run

        run(data_folder=ns.data, results_folder=ns.results,
            scratch_folder=ns.scratch)
    elif mode == "batch":
        from .destriper import batch_filter
        from .destriper_params import DestripingParams
        from .run_capsule import PRODUCTION_PARAMETERS

        params = DestripingParams.from_args(argv)
        batch_filter(
            input_path=params.input_path,
            output_path=params.output_path,
            workers=params.workers,
            chunks=params.chunks,
            high_int_filt_params=PRODUCTION_PARAMETERS["cells_config"],
            low_int_filt_params=PRODUCTION_PARAMETERS["no_cells_config"],
            shadow_correction=None,
            output_format=params.output_format,
            dual_band=(
                {"crossover": params.crossover,
                 "threshold": params.dual_threshold}
                if params.dual_band else None
            ),
        )
    else:
        print(f"unknown mode {mode!r}; use 'capsule' or 'batch'", file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
