from pacednegatives_tpu.curriculum.base import StepSignals, Controller
from pacednegatives_tpu.curriculum.interp import InterpController
from pacednegatives_tpu.curriculum.level import LevelController
from pacednegatives_tpu.curriculum.eta import EtaController
from pacednegatives_tpu.curriculum.contrast import ContrastController
from pacednegatives_tpu.curriculum.meta import MetaWeightTable

CONTROLLERS = {
    "interp": InterpController,
    "level": LevelController,
    "eta": EtaController,
    "contrast": ContrastController,
}

__all__ = [
    "StepSignals",
    "Controller",
    "InterpController",
    "LevelController",
    "EtaController",
    "ContrastController",
    "MetaWeightTable",
    "CONTROLLERS",
]
