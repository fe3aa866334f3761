"""Generic training CLI: ``python -m pacednegatives_tpu.cli.train --curriculum
lce --triples pools.jsonl --docs docs.tsv --queries queries.tsv ...``

Thin wrappers preset the curriculum to mirror the reference entry points:
  cli.train_lce     <- reference train/train_lce.py
  cli.train_eta     <- train/eta.py
  cli.train_level   <- train/level.py
  cli.train_interp  <- train/interpolate.py
  cli.train_std     <- train/std.py (meta-std bilevel)
"""

from __future__ import annotations

import json

from pacednegatives_tpu.train.runner import RunConfig, run
from pacednegatives_tpu.utils.config import apply_overrides, parse_cli


def main(preset: dict | None = None, argv=None) -> dict:
    cfg = RunConfig(**(preset or {}))
    cfg = apply_overrides(cfg, parse_cli(argv))
    summary = run(cfg)
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
