from xmlschema_ray.engine.diff import diff_validation_runs
from xmlschema_ray.engine.engine import ValidationEngine, ValidationResult

__all__ = ["diff_validation_runs", "ValidationEngine", "ValidationResult"]
