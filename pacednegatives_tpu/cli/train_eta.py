"""Entry point mirroring the reference train/eta.py."""

from pacednegatives_tpu.cli.train import main

if __name__ == "__main__":
    main(preset={"curriculum": "eta"})
