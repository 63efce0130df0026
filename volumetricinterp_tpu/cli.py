"""Console entry point (reference run_volumetricinterp.py:14-35).

    volumetricinterp [--validate] config.ini

Extensions: --starttime/--endtime window the fit from the command line,
--resume continues a partially-written output file, --profile dumps a
phase-time report.
"""

from __future__ import annotations

import datetime as dt
from argparse import ArgumentParser, RawTextHelpFormatter

description = (
    "Calculate coefficients for volmetric interpolation of a scalar "
    "quantity in a fitted AMISR file."
)


def _config_help():
    try:
        import importlib.resources as res

        text = (
            res.files("volumetricinterp_tpu").joinpath("example_config.ini")
            .read_text()
        )
        body = "".join(
            line for line in text.splitlines(keepends=True)
            if not line.startswith("#") and len(line.strip()) > 0
        )
        return (
            "A configuration file that specifies the following parameters:\n"
            + body
        )
    except Exception:
        return "A configuration file (see example_config.ini)."


def main(argv=None):
    parser = ArgumentParser(description=description,
                            formatter_class=RawTextHelpFormatter)
    parser.add_argument("config_file", help=_config_help())
    parser.add_argument("--validate", action="store_true")
    parser.add_argument("--starttime", default=None,
                        help="ISO start time (overrides full-file fit)")
    parser.add_argument("--endtime", default=None, help="ISO end time")
    parser.add_argument("--resume", action="store_true",
                        help="checkpointed mode: flush each record chunk to "
                             "the output file and resume a partial run")
    parser.add_argument("--profile", action="store_true",
                        help="print per-phase wall times at the end")
    parser.add_argument("--distributed", action="store_true",
                        help="multi-process scale-out: initialize "
                             "jax.distributed (VITPU_COORDINATOR / "
                             "VITPU_NUM_PROCESSES / VITPU_PROCESS_ID, or "
                             "auto-detected on TPU pods) and shard records "
                             "across processes/slices")

    args = vars(parser.parse_args(argv))

    if args["distributed"]:
        from .parallel.distributed import initialize_distributed

        pid, nproc = initialize_distributed()
        print(f"distributed: process {pid} / {nproc}")

    if args["validate"]:
        from .validate import Validate

        validate = Validate(args["config_file"])
        validate.interpolate()
        validate.create_plots()
    else:
        from .interpolate import Interpolate

        interp = Interpolate(args["config_file"])
        st = (
            dt.datetime.fromisoformat(args["starttime"])
            if args["starttime"] else None
        )
        et = (
            dt.datetime.fromisoformat(args["endtime"])
            if args["endtime"] else None
        )
        interp.calc_coeffs(starttime=st, endtime=et, resume=args["resume"])
        interp.saveh5()
        if args["profile"]:
            for k, v in interp.timer.report().items():
                print(f"{k:24s} {v:8.3f} s")


def validate_main(argv=None):
    """Standalone validation entry (reference run_validate.py:16-28)."""
    parser = ArgumentParser(
        description=(
            "Validate parameters in a config file by interpolating and "
            "plotting a short time window."
        ),
        formatter_class=RawTextHelpFormatter,
    )
    parser.add_argument("config_file", help=_config_help())
    args = vars(parser.parse_args(argv))

    from .validate import Validate

    validate = Validate(args["config_file"])
    validate.interpolate()
    validate.create_plots()


if __name__ == "__main__":
    main()
