from pacednegatives_tpu.distill.teacher import TeacherScores, score_teachers
from pacednegatives_tpu.distill.miner import EnsembleMiner
from pacednegatives_tpu.distill.loader import TeacherBatcher
from pacednegatives_tpu.distill.train import make_distill_step

__all__ = [
    "TeacherScores",
    "score_teachers",
    "EnsembleMiner",
    "TeacherBatcher",
    "make_distill_step",
]
