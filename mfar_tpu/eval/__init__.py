from mfar_tpu.eval.metrics import evaluate, evaluate_files

__all__ = ["evaluate", "evaluate_files"]
