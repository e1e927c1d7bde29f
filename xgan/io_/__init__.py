from xgan.io_.checkpoint import load_variables, save_variables
from xgan.io_.metrics import write_json

__all__ = ["save_variables", "load_variables", "write_json"]
