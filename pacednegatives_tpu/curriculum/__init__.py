from pacednegatives_tpu.curriculum.base import StepSignals, Controller
from pacednegatives_tpu.curriculum.interp import InterpController
from pacednegatives_tpu.curriculum.level import LevelController
from pacednegatives_tpu.curriculum.eta import EtaController
from pacednegatives_tpu.curriculum.meta import MetaWeightTable

CONTROLLERS = {
    "interp": InterpController,
    "level": LevelController,
    "eta": EtaController,
}

__all__ = [
    "StepSignals",
    "Controller",
    "InterpController",
    "LevelController",
    "EtaController",
    "MetaWeightTable",
    "CONTROLLERS",
]
