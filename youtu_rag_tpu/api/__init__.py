from .app import create_app
from .state import ApiState, LocalFileStore

__all__ = ["ApiState", "LocalFileStore", "create_app"]
