"""Command-line entry: ``python -m svd_lstm_tpu <command> [args]``.

Commands map to the workflow scripts in examples/ (the reference ran bare
scripts top-to-bottom; here each stage is a subcommand over the library):

    train      — train the full dense regressor (examples/train_full_model)
    compress   — factorize → Hoyer fine-tune → truncate → benchmark
    sweep      — rank-reduction sweep, RMSE curve + gif
    timing     — timing-vs-rank curves
    freq       — toy sine-series task
    bench      — headline benchmark JSON line
"""

import runpy
import os
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_COMMANDS = {
    "train": "examples/train_full_model.py",
    "compress": "examples/svd_acceleration.py",
    "sweep": "examples/rank_sweep.py",
    "timing": "examples/timing_curves.py",
    "freq": "examples/frequency_prediction.py",
    "bench": "bench.py",
}


def main():
    if len(sys.argv) < 2 or sys.argv[1] not in _COMMANDS:
        print(__doc__)
        print("commands:", ", ".join(_COMMANDS))
        raise SystemExit(2)
    script = os.path.join(_HERE, _COMMANDS[sys.argv[1]])
    sys.argv = [script] + sys.argv[2:]
    runpy.run_path(script, run_name="__main__")


if __name__ == "__main__":
    main()
