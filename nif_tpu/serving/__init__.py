from .export import (export_apply, load_exported, predict,
                     predict_grouped, predict_shared_mesh)

__all__ = ["export_apply", "load_exported", "predict", "predict_grouped",
           "predict_shared_mesh"]
