from .excel_agent import ExcelAgent
from .framework import DTRFramework

__all__ = ["ExcelAgent", "DTRFramework"]
