from .pipeline import Pipeline, Stage, run_pipeline

__all__ = ["Pipeline", "Stage", "run_pipeline"]
