from bento_ray.functions.bloblang import FUNCTIONS, METHODS, apply_method, call

__all__ = ["FUNCTIONS", "METHODS", "apply_method", "call"]
