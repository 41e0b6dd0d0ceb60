from xmlschema_ray.engine.engine import ValidationEngine, ValidationResult

__all__ = ["ValidationEngine", "ValidationResult"]
