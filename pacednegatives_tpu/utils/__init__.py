from pacednegatives_tpu.utils.config import parse_cli, apply_overrides

__all__ = ["parse_cli", "apply_overrides"]
