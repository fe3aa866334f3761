from pacednegatives_tpu.index.dense import DenseIndex

__all__ = ["DenseIndex"]
