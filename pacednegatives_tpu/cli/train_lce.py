"""Entry point mirroring the reference train/train_lce.py."""

from pacednegatives_tpu.cli.train import main

if __name__ == "__main__":
    main(preset={"curriculum": "lce"})
