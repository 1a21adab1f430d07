"""CLI dispatcher: python -m sdflabel_tpu.main <config.ini> --train|--refine|--evaluate|--demo

Behavioral parity target: main.py:20-60 — argparse + INI parse, seeding,
config snapshot into the log dir, dispatch to the four pipelines.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

import numpy as np

from sdflabel_tpu import config as cfg_mod


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("config", default="config.ini", help="config file")
    parser.add_argument("--train", "-trn", action="store_true",
                        help="train css network")
    parser.add_argument("--refine", "-ref", action="store_true",
                        help="pose/shape refinement")
    parser.add_argument("--evaluate", "-eval", action="store_true",
                        help="evaluate generated dumps")
    parser.add_argument("--demo", "-d", action="store_true",
                        help="demo refinement")
    args = parser.parse_args(argv)

    np.random.seed(1)

    try:
        cfgp = cfg_mod.load_ini(args.config)
    except FileNotFoundError:
        print("Error: None of the config files could be read")
        sys.exit(1)

    log_dir = cfg_mod.read_cfg_string(cfgp, "log", "dir", default="log")
    os.makedirs(log_dir, exist_ok=True)
    shutil.copyfile(
        args.config,
        os.path.join(log_dir, os.path.basename(log_dir.rstrip("/")) + ".ini"),
    )

    if args.train:
        from sdflabel_tpu.pipelines.train_css import train_css

        train_css(cfgp)
    elif args.refine:
        from sdflabel_tpu.pipelines.refine_css import refine_css

        refine_css(cfgp)
    elif args.evaluate:
        from sdflabel_tpu.pipelines.evaluate_dump import evaluate

        evaluate(cfgp)
    elif args.demo:
        from sdflabel_tpu.pipelines.refine_css import refine_css_demo

        refine_css_demo(cfgp)


if __name__ == "__main__":
    main()
