from .zero_shot import build_zeroshot_classifier, make_dataset, run_zero_shot
from .checkpoint_load import load_model_params

__all__ = [
    "build_zeroshot_classifier",
    "make_dataset",
    "run_zero_shot",
    "load_model_params",
]
