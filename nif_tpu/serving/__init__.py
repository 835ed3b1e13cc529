from .export import export_apply, load_exported, predict

__all__ = ["export_apply", "load_exported", "predict"]
