from xmlschema_ray.functions import hashing, text, vector

__all__ = ["hashing", "text", "vector"]
